"""Physical-layout checks: bucketed joins must not shuffle; partition
filters must prune at the scan."""

import pytest
from pyspark.sql import functions as F

from mover_spark.sources.layout import (
    assert_no_join_exchange,
    bucketed_exact_dedup,
    ensure_bucketed_by_digest,
    plan_string,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, catalog, tmp_path, no_broadcast):
    ords = write_bucketed(
        catalog.df("orders"), "orders_bkt", ["o_orderkey"], 8, str(tmp_path / "o")
    )
    li = write_bucketed(
        catalog.df("lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_bkt",
        ["o_orderkey"],
        8,
        str(tmp_path / "l"),
    )
    joined = li.join(ords, on=["o_orderkey"]).select("o_orderkey", "l_quantity", "o_totalprice")
    assert_no_join_exchange(joined)
    # and the result is still correct
    expect = catalog.df("lineitem").join(
        catalog.df("orders"), F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert joined.count() == expect
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_dedup_has_no_exchange(spark, catalog, tmp_path, no_broadcast):
    """The recurring-job dedup shape: once documents are bucketed by their
    content digest, the nightly re-dedup (digest groupBy + canonical-id
    join) must plan with ZERO shuffle exchanges — agg and join both run on
    the bucket key."""
    docs = catalog.df("documents").select("doc_id", "text", "n_chars")
    bucketed = ensure_bucketed_by_digest(
        spark, docs, "docs_bkt_unit", path=str(tmp_path / "docs")
    )
    kept = bucketed_exact_dedup(bucketed)
    assert_no_join_exchange(kept)
    # the whole dedup is a pure scan: window over the bucketed scan,
    # no join, no aggregate pre-shuffle
    plan = plan_string(kept)
    assert "Window" in plan and "SortMergeJoin" not in plan
    # re-entry reuses the registered table instead of rewriting
    again = ensure_bucketed_by_digest(spark, docs, "docs_bkt_unit")
    assert again.columns == bucketed.columns
    # and the result is still a correct exact dedup: one keeper per digest,
    # each the smallest doc_id of its duplicate group
    expect = (
        docs.groupBy(F.md5(F.col("text")).alias("dg"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    got = kept.select("doc_id").orderBy("doc_id").collect()
    want = expect.select("doc_id").orderBy("doc_id").collect()
    assert got == want
    spark.sql("DROP TABLE IF EXISTS docs_bkt_unit")


def test_unbucketed_join_does_exchange(spark, catalog, no_broadcast):
    # control: the same join over plain parquet shuffles both sides
    joined = catalog.df("lineitem").join(
        catalog.df("orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    assert "Exchange" in plan_string(joined)


def test_partitioned_write_prunes_scan(spark, catalog, tmp_path):
    ev = catalog.df("events").withColumn("day", F.to_date("ts"))
    re_read = write_partitioned(ev, str(tmp_path / "ev"), ["day"])
    one_day = re_read.where(F.col("day") == F.lit("2024-01-05").cast("date"))
    plan = plan_string(one_day)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]
    # pruned read returns exactly the rows of that day
    expect = ev.where(F.to_date("ts") == F.lit("2024-01-05").cast("date")).count()
    assert one_day.count() == expect


def test_compact_parquet_reduces_file_count(spark, catalog, tmp_path):
    import os

    from mover_spark.sources.layout import compact_parquet

    frag = str(tmp_path / "frag")
    catalog.df("orders").repartition(64).write.parquet(frag)
    n_in = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_in >= 32  # genuinely fragmented input

    out = str(tmp_path / "compact")
    n_out = compact_parquet(spark, frag, out, target_mb=128)
    n_files = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_files == n_out < n_in
    # content preserved exactly
    assert spark.read.parquet(out).count() == catalog.df("orders").count()


def test_audit_plan_facts(spark, catalog):
    """plans.audit_plan turns explain output into assertable scale gates:
    pushdown reaches the scan, columns are pruned, dims broadcast, and no
    row-at-a-time Python eval hides in relational plans."""
    import pyspark.sql.functions as F

    from mover_spark.plans import audit_plan

    li = catalog.df("lineitem")
    q = li.where(F.col("l_shipdate") >= "1997-01-01").select("l_orderkey", "l_quantity")
    a = audit_plan(q)
    assert a["pushed_filters"], "filter did not reach the parquet scan"
    assert a["scan_column_counts"] and max(a["scan_column_counts"]) <= 3, (
        "column pruning failed: scan reads more than the 3 needed columns"
    )
    assert not a["has_python_eval"]

    j = li.join(F.broadcast(catalog.df("part")), li.l_partkey == F.col("p_partkey"))
    aj = audit_plan(j)
    assert aj["n_broadcast_joins"] >= 1


def test_zorder_tightens_both_columns(spark, catalog, tmp_path):
    """Z-order clustering: per-file min/max ranges must be materially
    tighter than the global range on BOTH dimensions — the property row-
    group skipping depends on. A single-column sort only achieves this for
    its leading column."""
    import glob as globmod

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from mover_spark.sources.layout import write_zordered

    # two independent uniform dims derived from orders keys
    df = catalog.df("orders").select(
        F.pmod(F.col("o_orderkey") * 2654435761 % (1 << 31), F.lit(1024)).alias("xa"),
        F.pmod(F.col("o_custkey") * 40503 % (1 << 31), F.lit(1024)).alias("xb"),
    )

    def avg_file_spread(path, col):
        spreads = []
        for f in globmod.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            lo = min(md.row_group(i).column(_col_idx(md, col)).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(_col_idx(md, col)).statistics.max
                     for i in range(md.num_row_groups))
            spreads.append(hi - lo)
        return sum(spreads) / len(spreads)

    def _col_idx(md, name):
        sch = md.schema
        for i in range(len(sch)):
            if sch.column(i).name == name:
                return i
        raise KeyError(name)

    z_path = str(tmp_path / "zorder")
    write_zordered(df, z_path, "xa", "xb", n_files=16, bits=10)
    plain_path = str(tmp_path / "plain")
    (
        df.repartitionByRange(16, F.col("xa"))
        .sortWithinPartitions("xa")
        .write.mode("overwrite")
        .parquet(plain_path)
    )

    # plain sort: xa clusters (tight), xb doesn't (≈ full 0..1023 range)
    assert avg_file_spread(plain_path, "xa") < 256
    assert avg_file_spread(plain_path, "xb") > 768
    # z-order: BOTH columns materially tighter than the global range
    assert avg_file_spread(z_path, "xa") < 600
    assert avg_file_spread(z_path, "xb") < 600


def test_dynamic_partition_pruning_on_dim_filter(spark, catalog, tmp_path, no_broadcast):
    """DPP: a filter on the DIM side prunes the partitioned FACT scan at
    runtime — the plan carries a dynamicpruning subquery in the fact's
    partition filters instead of scanning every partition. This is the
    mechanism that makes star-schema date-range queries scan-bound at
    100 TB; it only fires for joins on a partition column, which is why
    fact tables get partitioned by their hottest join/filter key."""
    from mover_spark.sources.layout import write_partitioned

    fact = write_partitioned(
        catalog.df("events").withColumn("etype", F.col("event_type")),
        str(tmp_path / "fact"),
        ["etype"],
    )
    dim = spark.createDataFrame(
        [("purchase", 1), ("click", 0), ("view", 0), ("error", 0), ("signup", 0)],
        "etype string, is_conversion int",
    )
    joined = fact.join(dim.where(F.col("is_conversion") == 1), on=["etype"])
    plan = plan_string(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expect = (
        catalog.df("events").where(F.col("event_type") == "purchase").count()
    )
    assert joined.count() == expect


def test_write_bucketed_reclaims_orphan_managed_location(spark, catalog):
    """A crashed session leaves a managed table's warehouse directory on
    disk with no catalog registration; re-running the ingest must reclaim
    it instead of dying with LOCATION_ALREADY_EXISTS (hit live: a killed
    correctness run orphaned docs_bkt_sf0_01 and every rerun failed)."""
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = os.path.join(wh, "docs_bkt_orphan_t")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "stale.parquet"), "w") as f:
        f.write("not a real parquet file")
    assert not spark.catalog.tableExists("docs_bkt_orphan_t")
    docs = catalog.df("documents").select("doc_id", "text", "n_chars")
    out = ensure_bucketed_by_digest(spark, docs, "docs_bkt_orphan_t")
    assert out.count() == docs.count()
    assert not os.path.exists(os.path.join(orphan, "stale.parquet"))
    spark.sql("DROP TABLE IF EXISTS docs_bkt_orphan_t")


def test_orphan_sweep_respects_current_database(spark, catalog, tmp_path):
    """Under `USE somedb`, a bare table name must resolve to somedb's
    managed location for the orphan sweep — NOT <warehouse>/<tbl>, which
    may be the live data directory of a same-named default-db table
    (pre-fix: silent data loss)."""
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    docs = catalog.df("documents").select("doc_id", "n_chars").limit(10)
    spark.sql("DROP TABLE IF EXISTS sweep_victim")
    docs.write.mode("overwrite").saveAsTable("sweep_victim")  # managed, default db
    victim_dir = os.path.join(wh, "sweep_victim")
    assert os.path.isdir(victim_dir), "fixture assumption: managed location"
    spark.sql("CREATE DATABASE IF NOT EXISTS sweepdb")
    spark.sql("USE sweepdb")
    try:
        # bare name, unregistered in sweepdb -> sweep fires; must target
        # <warehouse>/sweepdb.db/sweep_victim, leaving the default-db data
        from mover_spark.sources.layout import _drop_orphan_managed_location

        _drop_orphan_managed_location(spark, "sweep_victim")
        assert os.path.isdir(victim_dir), "sweep deleted another db's table data"
        assert spark.table("default.sweep_victim").count() == 10
    finally:
        spark.sql("USE default")
        spark.sql("DROP DATABASE IF EXISTS sweepdb CASCADE")
        spark.sql("DROP TABLE IF EXISTS sweep_victim")


def test_bucketed_exact_dedup_drops_null_digests(spark, catalog, tmp_path):
    """Null text hashes to a null digest, which identifies nothing: the
    dedup must drop those rows (matching normalized_dedup and the
    equi-join oracle), not elect one null-text row as a canonical doc."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha"),
            Row(doc_id=2, text="alpha"),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text=None),
        ]
    )
    spark.sql("DROP TABLE IF EXISTS docs_null_bkt")
    bucketed = ensure_bucketed_by_digest(
        spark, docs, "docs_null_bkt", path=str(tmp_path / "nulls")
    )
    kept = bucketed_exact_dedup(bucketed)
    assert sorted(r.doc_id for r in kept.collect()) == [1]
    spark.sql("DROP TABLE IF EXISTS docs_null_bkt")
