"""Versioned dataset snapshots on plain parquet — manifest-driven time
travel for reproducible training data (the capability a 100-TB corpus
pipeline needs before anything else: "which exact rows did run X train
on?"). Beyond the reference surface (mover's sink is a one-shot JSON
dump, etl/engine.go:141-164); the commit protocol is the public
lakehouse-table pattern (Armbrust et al., "Delta Lake: High-Performance
ACID Table Storage over Cloud Object Stores", VLDB 2020), re-expressed
minimally: immutable data directories + a JSON manifest per version,
made visible by ONE non-overwrite manifest create.

Layout under ``<path>/``:

    data/v000000001/   parquet files of commit 1 (immutable once committed)
    data/v000000002/   ...
    _manifest/v000000001.json   {"version", "mode", "dirs", "schema"}

Scale/durability properties:

- **Append is O(increment)**: a commit writes only its own data directory
  and one small manifest; no existing file is rewritten or even listed
  beyond the manifest directory.
- **Time travel is manifest-driven pruning**: reading version N opens
  exactly the directories N's manifest lists — like partition pruning,
  no directory walk over the full history.
- **Crash safety**: a writer that dies before its manifest create leaves
  an orphan data directory that no manifest references — invisible to
  every reader, reclaimable by inspection. A writer that dies INSIDE the
  manifest write leaves a torn manifest that fails loudly at JSON parse
  (never a silently wrong view); `snapshot_vacuum` under the usual
  no-active-writer discipline is the recovery point.
- **Optimistic concurrency**: the manifest file itself is the version
  claim — it is created with ``overwrite=False``, so two racing writers
  cannot both commit the same version: the loser's create fails before
  a single byte lands and raises. On HDFS-like stores non-overwrite
  create is atomic; on connectors whose non-overwrite create is
  check-then-act (raw local FS) the race window shrinks to that one
  call — and crucially there is no rename step, so a POSIX
  rename-replaces-destination can never silently swap the winner's
  manifest for the loser's.
- **Storage-agnostic**: all filesystem access goes through the Hadoop
  FileSystem API of the session (manifest reads through spark.read.text),
  so the same code runs on local disk, HDFS, or an object store mount.

The stored schema (this commit's schema, as StructType JSON) makes empty
commits readable and pins time-travel reads to the schema that version
actually had. Cross-version schema EVOLUTION is out of scope here —
sources/formats.py's mergeSchema reads cover it.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifest"
_DATA_DIR = "data"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _jpath(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def _list_versions(spark: SparkSession, path: str) -> list[int]:
    fs, jvm = _fs(spark, path)
    mdir = _jpath(jvm, f"{path}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue  # foreign file in the manifest dir: not a version
    return sorted(out)


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    mfile = f"{path}/{_MANIFEST_DIR}/v{version:09d}.json"
    # one tiny job through the session's FS layer — works on any storage
    lines = [r.value for r in spark.read.text(mfile).collect()]
    return json.loads("\n".join(lines))


def snapshot_commit(
    df: DataFrame, path: str, mode: str = "append"
) -> int:
    """Commit `df` as the next version of the snapshot at `path`.

    mode='append': the new version sees every directory the previous
    version saw plus this commit's. mode='overwrite': the new version
    sees ONLY this commit's directory (history stays readable — old
    versions keep their manifests and data).

    Returns the committed version number. Raises if a concurrent writer
    claimed the same version (the manifest rename target already exists).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    fs, jvm = _fs(spark, path)
    versions = _list_versions(spark, path)
    version = (versions[-1] + 1) if versions else 1
    prev_dirs: list[str] = []
    if mode == "append" and versions:
        prev_dirs = _read_manifest(spark, path, versions[-1])["dirs"]

    # the data directory is unique PER WRITER (not just per version): on
    # an object store two racing writers would otherwise interleave files
    # in one deterministic directory and the winner's manifest would see
    # the loser's rows — with unique dirs the manifest rename below is
    # the sole arbiter and the loser's directory stays orphaned/invisible
    data_dir = f"{_DATA_DIR}/v{version:09d}-{uuid.uuid4().hex[:8]}"
    df.write.mode("error").parquet(f"{path}/{data_dir}")

    manifest = {
        "version": version,
        "mode": mode,
        "dirs": prev_dirs + [data_dir],
        "schema": df.schema.jsonValue(),
    }
    mdir = _jpath(jvm, f"{path}/{_MANIFEST_DIR}")
    fs.mkdirs(mdir)
    final = _jpath(jvm, f"{path}/{_MANIFEST_DIR}/v{version:09d}.json")
    # The non-overwrite CREATE of the manifest is the sole version
    # arbiter (no rename: several connectors' rename replaces an existing
    # destination, which would let a stale-view loser silently swap out
    # the winner's manifest in the exists()+rename TOCTOU window). The
    # manifest streams through the claiming create, so a loser fails
    # before any bytes land; a crash mid-stream leaves a torn manifest
    # that reads loudly, never a silently wrong one.
    conflict = RuntimeError(
        f"snapshot_commit: version {version} at {path} was committed "
        "concurrently; retry to commit on top of it"
    )
    if fs.exists(final):  # fast path + friendly error for the common case
        raise conflict
    try:
        out = fs.create(final, False)
    except Exception:
        if fs.exists(final):  # lost the create race to a concurrent writer
            raise conflict from None
        raise
    out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    out.close()
    return version


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The snapshot as of `version` (default: latest). Opens exactly the
    data directories that version's manifest lists, with that version's
    stored schema (so empty commits read fine and time travel pins the
    historical schema)."""
    versions = _list_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshot versions at {path}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(f"version {version} not in {versions} at {path}")
    m = _read_manifest(spark, path, version)
    schema = StructType.fromJson(m["schema"])
    reader = spark.read.schema(schema)
    return reader.parquet(*[f"{path}/{d}" for d in m["dirs"]])


def snapshot_versions(spark: SparkSession, path: str) -> DataFrame:
    """History listing: (version, mode, n_dirs) per committed version."""
    rows = []
    for v in _list_versions(spark, path):
        m = _read_manifest(spark, path, v)
        rows.append((m["version"], m["mode"], len(m["dirs"])))
    return spark.createDataFrame(
        rows, "version int, mode string, n_dirs int"
    )


def snapshot_compact(
    spark: SparkSession, path: str, target_partitions: int | None = None
) -> int:
    """Rewrite the LATEST version's content as one fresh overwrite commit
    with a controlled file count — the small-files maintenance step for
    an append-heavy snapshot (every daily append adds a directory; after
    N appends a read opens N directories). History stays readable: old
    versions keep their manifests and data until `snapshot_vacuum`
    reclaims them. Returns the new version number."""
    cur = read_snapshot(spark, path)
    if target_partitions is None:
        # one output file per shuffle partition worth of data, floor 1
        target_partitions = max(1, cur.rdd.getNumPartitions() // 4)
    return snapshot_commit(cur.coalesce(target_partitions), path, mode="overwrite")


def snapshot_vacuum(
    spark: SparkSession, path: str, keep_versions: int | None = None
) -> list[str]:
    """Reclaim storage: delete data directories no retained manifest
    references (orphans from crashed/raced writers, and — when
    `keep_versions` bounds the history — directories only old versions
    used, whose manifests are dropped too). Returns the deleted
    directory names.

    CAVEAT (same as every lakehouse vacuum): an orphan directory is
    indistinguishable from a commit IN PROGRESS — run vacuum from the
    same single-maintenance-job discipline as compaction, or only when
    no writer can be active."""
    fs, jvm = _fs(spark, path)
    versions = _list_versions(spark, path)
    keep = versions if keep_versions is None else versions[-keep_versions:]
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(spark, path, v)["dirs"])
    deleted: list[str] = []
    for v in versions:
        if v not in keep:
            fs.delete(_jpath(jvm, f"{path}/{_MANIFEST_DIR}/v{v:09d}.json"), False)
    ddir = _jpath(jvm, f"{path}/{_DATA_DIR}")
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            name = st.getPath().getName()
            if f"{_DATA_DIR}/{name}" not in referenced:
                fs.delete(st.getPath(), True)
                deleted.append(name)
    return sorted(deleted)


def snapshot_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Key-level membership diff between two versions: one row per key
    that appears in exactly one of the two, tagged 'added' (in v_to only)
    or 'removed' (in v_from only). Two anti-joins over the pruned
    version reads — never a full-history scan; for the common
    append-only case AQE broadcasts the smaller side."""
    a = read_snapshot(spark, path, v_from).select(*key_cols).distinct()
    b = read_snapshot(spark, path, v_to).select(*key_cols).distinct()
    added = b.join(a, key_cols, "left_anti").withColumn("change", F.lit("added"))
    removed = a.join(b, key_cols, "left_anti").withColumn(
        "change", F.lit("removed")
    )
    return added.unionByName(removed)
