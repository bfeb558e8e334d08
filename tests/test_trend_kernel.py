"""Regression pin for the optimization-round rewrite of
user_value_trend_pandas: the partition-batched numpy kernel (mapInPandas +
argsort/reduceat segment sums) must be row-identical to the previous
grouped-map applyInPandas kernel — same integer sums, same Python-int
finish, same rounding."""

import pandas as pd
from pyspark.sql import functions as F


def _grouped_map_reference(cat):
    """The pre-optimization kernel, verbatim (one Python call per group)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ts = pdf["ts"].astype("int64").to_numpy() // 1_000_000_000
        x = ts - ts.min()
        y = pdf["y"].to_numpy()
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy, sxx = int((x * y).sum()), int((x * x).sum())
        denom = n * sxx - sx * sx
        slope = (
            round((n * sxy - sx * sy) / denom / 10000.0 * 3600.0, 6) if denom else None
        )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "slope_per_hour": [slope],
            }
        )

    ev = cat.df("events").select(
        "user_id", "ts", F.round(F.col("value") * 10000).cast("long").alias("y")
    )
    return ev.groupBy("user_id").applyInPandas(
        fit, "user_id long, n_events long, slope_per_hour double"
    )


def test_trend_pandas_matches_grouped_map_reference(spark, catalog):
    from mover_spark.operators.events import user_value_trend_pandas

    got = {
        (r.user_id, r.n_events, r.slope_per_hour)
        for r in user_value_trend_pandas(catalog).collect()
    }
    want = {
        (r.user_id, r.n_events, r.slope_per_hour)
        for r in _grouped_map_reference(catalog).collect()
    }
    assert want, "fixture should produce per-user trends"
    assert got == want
