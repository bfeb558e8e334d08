"""mover_spark — a PySpark-native analytics/ETL engine with the capability
surface of ulule/mover (reference: /root/reference, read-only), re-designed
Spark-first, plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, event windowing).

Layout
------
- ``session``    SparkSession factory tuned for local[32] + cluster-safe confs
- ``catalog``    Table/Column/FK metadata (mover's dynamic-introspection posture;
                 reference: dialect/dialect.go:23-107) backed by parquet fixtures
                 + an FK sidecar
- ``config``     mover's config.json format, verbatim (config/config.go:11-52)
- ``engine``     Engine facade: describe / extract / load (etl/engine.go)
- ``operators``  closure (BFS FK-reachability), sanitize, dedup, similarity,
                 text analysis, event windows
- ``sources``    JSON envelope source/sink (etl/engine.go:141-164, loader.go),
                 JDBC catalog/upsert (gated; no DB in the test env)
- ``streaming``  Structured Streaming ingest over the events table
"""

__version__ = "0.1.0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
