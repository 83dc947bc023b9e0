"""Data-layout operators: space-filling-curve (Z-order) clustering.

At 100 TB the dominant cost of most queries is the scan, and the
dominant scan optimization is *file skipping*: parquet row-group
min/max statistics let the reader drop files whose key range cannot
match the predicate. Sorting by one column gives perfect skipping on
that column and none on any other; interleaving the bits of two keys
(the Z-order / Morton curve — the technique behind Databricks
``OPTIMIZE ... ZORDER BY`` and ClickHouse ``mortonEncode``) gives
*bounded* min/max rectangles on BOTH dimensions simultaneously, so
predicates on either column skip most of the data.

The write side lives in ``sinks/layout.py`` (``write_zordered``: one
range-exchange, no global sort stage; real parquet row-group stats
asserted in ``tests/test_sources_sinks.py``). ``q_zorder_layout``
below is its oracle-checkable query twin: it computes the curve value
and the resulting zone map (per-Z-bucket min/max per dimension,
exactly the statistics a parquet footer would carry), so the locality
guarantee is value-verified against DuckDB, not just plan-asserted:
every bucket's rectangle is provably bounded, which is the property
file skipping relies on.

No counterpart in the reference (a per-table copy pipeline has no
layout control; BigQuery clustering is delegated server-side —
/root/reference/bigquery_operations.py:24-33 sets only time
partitioning). This is part of the 100 TB extension surface
(SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query
from ..sinks.layout import Z_BITS, zorder_value


def _zorder_oracle() -> str:
    """DuckDB twin of :func:`zvalue` + the zone-map aggregation,
    generated from the same bit layout so the two engines cannot
    drift."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(((xs >> {i}) & 1) << {2 * i})")
        terms.append(f"(((ys >> {i}) & 1) << {2 * i + 1})")
    z = " + ".join(terms)
    return f"""
    WITH keys AS (
        SELECT CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y
        FROM lineitem
    ), bounds AS (
        SELECT MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax
        FROM keys
    ), scaled AS (
        SELECT x, y,
               (x - xmin) * 65536 // (xmax - xmin + 1) AS xs,
               (y - ymin) * 65536 // (ymax - ymin + 1) AS ys
        FROM keys, bounds
    ), zed AS (
        SELECT x, y, ({z}) AS z FROM scaled
    )
    SELECT z >> 24 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM zed
    GROUP BY bucket
    """


@query("q_zorder_layout", oracle=_zorder_oracle())
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order zone map over lineitem's (l_partkey, l_suppkey).

    Pipeline (all codegen, one real shuffle):
      1. 1-row global min/max of both keys, broadcast back (the rescale
         must be domain-adaptive — key ranges differ per SF/tenant)
      2. rescale each key to 16 bits via integer floor-division, then
         Morton-interleave to a 32-bit Z value (the same
         ``sinks.layout.zorder_value`` expression the sink writes with)
      3. bucket = top 4+4 bits (a 16×16 grid cell) and aggregate the
         zone map: per-bucket row count + min/max of BOTH raw keys

    The output IS the file-skipping argument: every bucket's
    (x_min..x_max, y_min..y_max) rectangle spans ≤ 1/16th of each key
    domain (asserted in tests/test_properties.py), so a predicate on
    either key alone prunes ~15/16 of perfectly Z-laid files. A plain
    sort by l_partkey would give unbounded y-ranges.

    Scale: the bounds agg is a partial-agg to 1 row (broadcast join
    back is free); the zone-map agg is one shuffle on a 256-value key
    — no skew possible. The write-side layout (module docstring) adds
    only a range exchange.
    """
    keys = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("x"),
        F.col("l_suppkey").cast("long").alias("y"),
    )
    bounds = keys.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("y").alias("ymin"),
        F.max("y").alias("ymax"),
    )
    scaled = keys.join(F.broadcast(bounds)).select(
        "x",
        "y",
        F.expr("(x - xmin) * 65536 div (xmax - xmin + 1)").alias("xs"),
        F.expr("(y - ymin) * 65536 div (ymax - ymin + 1)").alias("ys"),
    )
    zed = scaled.withColumn("z", zorder_value(F.col("xs"), F.col("ys")))
    return (
        zed.groupBy(F.shiftright(F.col("z"), 24).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
