"""Engine facade — the three user actions of the reference CLI
(extract / load / describe, cmd/mover/main.go:70-93) on Spark.

extract: seed query -> FK-closure -> sanitize -> JSON envelopes + media list
         (etl/engine.go:104-134)
load:    JSON envelopes -> schema-coerced, PK-idempotent merge into the
         target (etl/engine.go:99-101; JDBC upsert when a DSN is given,
         parquet merge for file targets)
describe: catalog printout (etl/engine.go:89-96)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .config import MoverConfig
from .operators.closure import extract_closure
from .operators.sanitize import sanitize_df
from .sources import jsonio
from .util import get_query_table


class Engine:
    def __init__(self, spark: SparkSession, catalog: Catalog, config: MoverConfig | None = None):
        self.spark = spark
        self.catalog = catalog
        self.config = config or MoverConfig()

    # -- describe ------------------------------------------------------------

    def describe(self, table: str) -> list[dict]:
        return self.catalog.describe(table)

    # -- extract ---------------------------------------------------------

    def extract(
        self,
        out_dir: str,
        query: str,
        table: str | None = None,
        partitioned: bool = False,
        download_media: bool = False,
    ) -> dict[str, DataFrame]:
        """Seed query -> closure -> sanitize -> envelopes (engine.go:104-134)."""
        table = table or get_query_table(query)
        seed = self.spark.sql(query)
        seeds = [(table, seed)]
        # `extra` tables are full-scanned and closed over too (engine.go:117-125)
        for extra in self.config.extra_tables():
            seeds.append((extra, self.catalog.df(extra)))

        extracted = extract_closure(
            self.spark, self.catalog, seeds, self.config.schema_configs()
        )

        results: dict[str, DataFrame] = {}
        media: list[str] = []
        for tname, df in extracted.items():
            rules = self.config.column_rules(tname)
            pks = self.catalog.table(tname).primary_keys
            clean = sanitize_df(df, rules, pks, locale=self.config.locale,
                                dedup=self.catalog.table(tname).pk_unique)
            results[tname] = clean
            jsonio.write_envelope(clean, tname, out_dir, partitioned=partitioned)
            media.extend(self._media_paths(tname, clean, rules))
        if media:
            with open(os.path.join(out_dir, "_media_manifest.txt"), "w") as f:
                f.write("\n".join(media) + "\n")
            if download_media:
                self._download_media(media, out_dir)
        return results

    def _media_paths(self, table: str, df: DataFrame, rules) -> list[str]:
        """S14 filename collection (etl/util.go:48-72): values of
        Download-configured columns become base_url+path URLs."""
        urls: list[str] = []
        for rule in rules:
            if not rule.download:
                continue
            base = (rule.download.get("http") or {}).get("base_url", "")
            vals = [
                r[rule.name]
                for r in df.select(rule.name).where(F.col(rule.name).isNotNull()).collect()
            ]
            urls.extend(base + v for v in vals)
        return urls

    def _download_media(self, urls: list[str], out_dir: str) -> None:
        """S14 downloads, executor-parallel (the reference serialized them by
        accident — g.Wait() inside the loop, etl/util.go:110). Network is
        environment-gated."""
        media_dir = os.path.join(out_dir, "media")

        def fetch(it):
            import urllib.parse
            import urllib.request

            for url in it:
                rel = urllib.parse.urlparse(url).path.lstrip("/")
                dest = os.path.join(media_dir, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                try:
                    urllib.request.urlretrieve(url, dest)
                except Exception:
                    pass  # parity: reference logs and continues

        self.spark.sparkContext.parallelize(urls, max(1, len(urls) // 10)).foreachPartition(fetch)

    # -- load ------------------------------------------------------------

    def load(
        self,
        in_dir: str,
        target_dir: str | None = None,
        dsn: str | None = None,
    ) -> dict[str, DataFrame]:
        """Idempotent load of envelope files (loader.go:25-76).

        File target: anti-join on PK against existing rows == ON CONFLICT
        DO NOTHING, then append parquet. DB target: psycopg2 upsert sink.
        Load order is alphabetical like the reference's directory walk —
        survivable because constraints are not enforced on files (the
        reference disables triggers for the same reason)."""
        payloads = jsonio.read_envelopes(self.spark, in_dir)
        out: dict[str, DataFrame] = {}
        for tname in sorted(payloads):
            df = payloads[tname]
            if tname in self.catalog.tables:
                df = jsonio.coerce_to_schema(df, self.catalog.df(tname))
            out[tname] = df
            if dsn is not None:
                from .sources.jdbc import bulk_upsert

                pk = self.catalog.table(tname).primary_key
                bulk_upsert(df, dsn, tname, pk)
            elif target_dir is not None:
                dest = os.path.join(target_dir, f"{tname}.parquet")
                if os.path.exists(dest):
                    existing = self.spark.read.parquet(dest)
                    pks = (
                        self.catalog.table(tname).primary_keys
                        if tname in self.catalog.tables
                        else [df.columns[0]]
                    )
                    fresh = df.join(existing, on=pks, how="left_anti")
                    fresh.write.mode("append").parquet(dest)
                else:
                    df.write.parquet(dest)
        return out
