"""Fixture table access.

The driver's synthetic tables (TESTDATA.md) are one parquet file per
table. ``load_tables`` reads them lazily as DataFrames and registers
each as a temp view so operators can be written in either DataFrame or
SQL form — Catalyst produces the same plan for both.

At cluster scale the same call works against a directory of many
parquet files per table; nothing here materializes data on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
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

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one table (column pruning + predicate
    pushdown happen automatically once the caller projects/filters).

    events.parquet stores ts as parquet TIMESTAMP(NANOS), which the
    Spark reader rejects outright; read it as raw nanos
    (legacy.parquet.nanosAsLong — a runtime-settable conf, so this
    works under any caller's session) and truncate to microseconds,
    the same ns→µs truncation DuckDB applies.
    """
    path = table_path(sf_dir, name)
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # Build TIMESTAMP_NTZ arithmetically from the raw nanos.
            # (timestamp_micros() yields an instant whose wall-clock
            # rendering depends on spark.sql.session.timeZone — under a
            # non-UTC caller session every event time would shift
            # relative to DuckDB's naive read. NTZ epoch + interval is
            # timezone-independent: days exact, intra-day seconds a
            # double that make_dt_interval re-rounds to exact micros.)
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestamp_ntz '1970-01-01 00:00:00' + make_dt_interval("
                    "ts div 86400000000000, 0, 0,"
                    " ((ts % 86400000000000) div 1000) / 1e6)"
                ),
            )
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """All fixture tables as DataFrames; optionally as temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
