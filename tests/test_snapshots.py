"""Versioned parquet snapshots (sources/snapshots.py): commit protocol,
time travel, crash invisibility, overwrite lineage, key diff."""

import os

import pytest

from mover_spark.sources.snapshots import (
    read_snapshot,
    snapshot_commit,
    snapshot_diff,
    snapshot_versions,
)


def _df(spark, ids):
    return spark.createDataFrame([(i, f"doc {i}") for i in ids], "id long, text string")


def test_commit_append_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "snap")
    assert snapshot_commit(_df(spark, [1, 2]), path) == 1
    assert snapshot_commit(_df(spark, [3]), path) == 2
    assert sorted(r.id for r in read_snapshot(spark, path).collect()) == [1, 2, 3]
    assert sorted(r.id for r in read_snapshot(spark, path, 1).collect()) == [1, 2]
    hist = {r.version: (r.mode, r.n_dirs) for r in snapshot_versions(spark, path).collect()}
    assert hist == {1: ("append", 1), 2: ("append", 2)}
    with pytest.raises(ValueError):
        read_snapshot(spark, path, 7)


def test_overwrite_starts_new_lineage_history_stays(spark, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_commit(_df(spark, [1, 2]), path)
    snapshot_commit(_df(spark, [9]), path, mode="overwrite")
    assert [r.id for r in read_snapshot(spark, path).collect()] == [9]
    # the pre-overwrite version is still readable — history is immutable
    assert sorted(r.id for r in read_snapshot(spark, path, 1).collect()) == [1, 2]
    # and appends on top of the overwrite see only the new lineage
    snapshot_commit(_df(spark, [10]), path)
    assert sorted(r.id for r in read_snapshot(spark, path).collect()) == [9, 10]


def test_orphan_data_dir_is_invisible(spark, tmp_path):
    """A writer that died after writing data but before the manifest
    create leaves nothing a reader can see — and the next real commit
    proceeds normally without absorbing the orphan's rows."""
    path = str(tmp_path / "snap")
    snapshot_commit(_df(spark, [1]), path)
    # simulate the crash: a version-2 data dir exists, no manifest
    _df(spark, [99]).write.parquet(
        os.path.join(path, "data", "v000000002-deadcafe")
    )
    assert [r.id for r in read_snapshot(spark, path).collect()] == [1]
    assert [r.version for r in snapshot_versions(spark, path).collect()] == [1]
    snapshot_commit(_df(spark, [3]), path)
    assert sorted(r.id for r in read_snapshot(spark, path).collect()) == [1, 3]


def test_concurrent_version_claim_raises(spark, tmp_path, monkeypatch):
    """Optimistic concurrency: a writer whose view of the version list is
    stale (the race window between listing and committing) must fail
    loudly at the non-overwrite manifest create — the sole arbiter, no
    rename involved — and never publish over the winner."""
    import mover_spark.sources.snapshots as snap

    path = str(tmp_path / "snap")
    snapshot_commit(_df(spark, [1]), path)
    snapshot_commit(_df(spark, [2]), path)  # the "winner" holds v2
    before = {
        v: sorted(r.id for r in read_snapshot(spark, path, v).collect())
        for v in (1, 2)
    }
    monkeypatch.setattr(snap, "_list_versions", lambda s, p: [1])  # stale view
    with pytest.raises(RuntimeError, match="concurrent"):
        snapshot_commit(_df(spark, [666]), path)
    monkeypatch.undo()
    after = {
        v: sorted(r.id for r in read_snapshot(spark, path, v).collect())
        for v in (1, 2)
    }
    assert after == before  # the loser changed nothing visible


def test_torn_manifest_reads_loudly(spark, tmp_path):
    """A writer that crashed INSIDE the manifest write (post-claim,
    mid-stream) leaves a torn manifest. Reads of that version must fail
    with a parse error — loud, never a silently wrong view — and the
    version number stays claimed (a retrying writer moves past it)."""
    import json as _json

    path = str(tmp_path / "snap")
    snapshot_commit(_df(spark, [1]), path)
    torn = os.path.join(path, "_manifest", "v000000002.json")
    with open(torn, "w") as f:
        f.write('{"version": 2, "mode": "app')  # truncated mid-stream
    with pytest.raises(_json.JSONDecodeError):
        read_snapshot(spark, path)  # latest = the torn v2
    with pytest.raises(_json.JSONDecodeError):
        snapshot_commit(_df(spark, [3]), path)  # append needs the torn tip
    assert sorted(r.id for r in read_snapshot(spark, path, 1).collect()) == [1]
    # the claim holds: an overwrite retry lands at v3, never replaces v2
    assert snapshot_commit(_df(spark, [3]), path, mode="overwrite") == 3
    assert [r.id for r in read_snapshot(spark, path).collect()] == [3]


def test_empty_commit_reads_with_stored_schema(spark, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_commit(_df(spark, []), path)
    out = read_snapshot(spark, path)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "text"]


def test_compact_and_vacuum(spark, tmp_path):
    """Compaction rewrites the latest content into a fresh overwrite
    commit (fewer directories per read); vacuum reclaims orphans and —
    with a retention bound — old-only directories, while every retained
    version stays readable."""
    import os as _os

    from mover_spark.sources.snapshots import snapshot_compact, snapshot_vacuum

    path = str(tmp_path / "snap")
    for ids in ([1, 2], [3], [4]):
        snapshot_commit(_df(spark, ids), path)
    # an orphaned (crashed-writer) directory to reclaim
    _df(spark, [99]).write.parquet(_os.path.join(path, "data", "v000000009-dead"))
    v4 = snapshot_compact(spark, path)
    assert v4 == 4
    assert sorted(r.id for r in read_snapshot(spark, path).collect()) == [1, 2, 3, 4]
    # keep only the compacted tip: the three append dirs + orphan go
    deleted = snapshot_vacuum(spark, path, keep_versions=1)
    assert len(deleted) == 4 and any(d.endswith("-dead") for d in deleted)
    assert sorted(r.id for r in read_snapshot(spark, path).collect()) == [1, 2, 3, 4]
    assert [r.version for r in snapshot_versions(spark, path).collect()] == [4]
    # unbounded vacuum right after: nothing left to reclaim
    assert snapshot_vacuum(spark, path) == []


def test_snapshot_diff_added_and_removed(spark, tmp_path):
    path = str(tmp_path / "snap")
    snapshot_commit(_df(spark, [1, 2, 3]), path)
    snapshot_commit(_df(spark, [4]), path)                      # append
    snapshot_commit(_df(spark, [2, 4, 5]), path, mode="overwrite")
    d12 = {(r.id, r.change) for r in snapshot_diff(spark, path, 1, 2, ["id"]).collect()}
    assert d12 == {(4, "added")}
    d23 = {(r.id, r.change) for r in snapshot_diff(spark, path, 2, 3, ["id"]).collect()}
    assert d23 == {(5, "added"), (1, "removed"), (3, "removed")}
