"""X17: the Python UDF surface — Arrow-vectorized only.

The engine's policy (SURVEY.md §4): built-in functions for everything
expressible; when Python is genuinely needed, ONLY Arrow-batched forms
(pandas_udf scalar / applyInPandas grouped) — never row-at-a-time
Python UDFs. Both entries here are oracle-checked against pure-SQL
equivalents, proving the UDF path is semantics-preserving.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, ROUND(LN(1 + value * 2), 6) AS log_scaled
    FROM events WHERE event_id < 2000
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-batched): log1p(2v). The same math is
    one F.log1p call — the point is validating the Arrow path end-to-
    end against the SQL oracle."""

    @F.pandas_udf("double")
    def log_scaled(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.log1p(v * 2))

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select("event_id", F.round(log_scaled("value"), 6).alias("log_scaled"))


@query(
    "udf_grouped_zscore",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 4) AS zscore
    FROM events
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas: per-event-type z-score, each group as one
    pandas DataFrame (Arrow transfer both ways).

    Scale: one shuffle on event_type; a skewed type is AQE's problem,
    and the per-group state is bounded by the group, not the dataset.
    pandas std(ddof=1) == STDDEV_SAMP by construction.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        out["zscore"] = ((pdf["value"] - mu) / sd).round(4)
        return out

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, zscore double"
    )
