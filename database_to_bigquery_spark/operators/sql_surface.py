"""SQL-surface operators (SURVEY.md §2b X1/X5/X11 extensions) that
exercise Spark's SQL front end where the DataFrame API has no direct
equivalent: recursive CTEs (Spark 4) and LATERAL correlated
subqueries — plus map-type functions and distribution statistics.

Each `spark.sql` entry registers its inputs as temp views first; the
SQL text goes through the same Catalyst pipeline as the DataFrame
queries (one logical plan, same physical strategies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query


@query(
    "q_recursive_month_spine",
    oracle="""
    WITH RECURSIVE months(m, hi) AS (
      SELECT date_trunc('month', MIN(o_orderdate)),
         date_trunc('month', MAX(o_orderdate))
      FROM orders
      UNION ALL
      SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
    )
    SELECT CAST(m AS DATE) AS month, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
    FROM months LEFT JOIN (
      SELECT date_trunc('month', o_orderdate) AS m2, COUNT(*) AS n
      FROM orders GROUP BY 1) o
    ON o.m2 = months.m
    """,
)
def q_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4): generate the complete
    month spine between the first and last order date by recursion,
    then left-join per-month order counts — the gap-revealing calendar
    join written the way a SQL user would (ts_gapfill_hourly is the
    sequence()/explode DataFrame twin of the same idea).

    Scale: the recursion produces one row per month (dozens) on the
    driver-side recursion anchor — trivially small; the month counts
    are one shuffle over the pre-aggregated orders."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m, hi) AS (
          SELECT date_trunc('month', MIN(o_orderdate)),
                 date_trunc('month', MAX(o_orderdate))
          FROM orders
          UNION ALL
          SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
        )
        SELECT CAST(m AS DATE) AS month, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
        FROM months LEFT JOIN (
          SELECT date_trunc('month', o_orderdate) AS m2, COUNT(*) AS n
          FROM orders GROUP BY 1) o
        ON o.m2 = months.m
        """
    )


@query(
    "q_lateral_topn",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS price
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey < 200
    """,
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: per customer, the two most
    expensive orders — the SQL-standard spelling of top-N-per-group
    (q_topk_per_group is the window-function twin; Catalyst decorrelates
    this into the same join+window shape rather than executing the
    subquery per row)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS price
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey < 200
        """
    )


@query(
    "q_map_functions",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events WHERE user_id < 50 GROUP BY 1, 2)
    SELECT user_id,
           CAST(to_json(list(event_type ORDER BY event_type)) AS VARCHAR)
             AS type_keys,
           CAST(to_json(list(CAST(n AS BIGINT) ORDER BY event_type)) AS VARCHAR)
             AS type_counts,
           CAST(MAX(CASE WHEN event_type = 'click' THEN n END) AS BIGINT) AS n_click
    FROM cnt GROUP BY user_id
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: build a per-user event_type→count map with
    map_from_entries, read it back with map_keys / element_at. The
    map is assembled from a deterministically sorted entry array so
    key order (and therefore the exported arrays) is stable across
    partitionings — the rule for ANY map aggregated from distributed
    rows (map iteration order is otherwise physical-order-dependent).

    The exported key/count arrays are JSON-encoded on BOTH sides: the
    driver's canonicalizer sorts result columns with pandas, which
    cannot factorize list cells (the r10 attestation crashed on exactly
    this — `TypeError: unhashable type: 'list'`), so the portable
    contract for array-valued result columns is a deterministic string
    encoding."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    cnt = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    entries = F.array_sort(F.collect_list(F.struct("event_type", "n")))
    g = cnt.groupBy("user_id").agg(entries.alias("entries"))
    m = F.map_from_entries("entries")
    return g.select(
        "user_id",
        F.to_json(F.map_keys(m)).alias("type_keys"),
        F.to_json(
            F.transform(F.map_keys(m), lambda k: F.element_at(m, k))
        ).alias("type_counts"),
        F.element_at(m, "click").alias("n_click"),
    )


@query(
    "q_stats_moments",
    oracle="""
    WITH mu AS (SELECT event_type, AVG(value) AS m FROM events GROUP BY 1)
    SELECT e.event_type,
           ROUND(STDDEV_SAMP(value), 4)  AS sd,
           ROUND(VAR_SAMP(value), 4)     AS variance,
           ROUND(CORR(value, CAST(user_id % 10 AS DOUBLE)), 4)       AS corr_decile,
           ROUND(COVAR_SAMP(value, CAST(user_id % 10 AS DOUBLE)), 4) AS covar_decile,
           ROUND(AVG(POWER(value - mu.m, 3))
                 / POWER(AVG(POWER(value - mu.m, 2)), 1.5), 4)       AS skew_m3
    FROM events e JOIN mu ON e.event_type = mu.event_type
    GROUP BY e.event_type
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution statistics per event type: sample stddev/variance,
    correlation and covariance against a derived decile, and skewness
    computed from explicit central moments. (Spark's built-in
    `skewness`/`kurtosis` use population formulas while other engines
    apply sample bias corrections — so the cross-engine-checkable form
    is the explicit m3/m2^1.5, with the group mean broadcast back.)"""
    ev = load_table(spark, sf_dir, "events")
    mu = ev.groupBy(F.col("event_type").alias("mu_type")).agg(
        F.avg("value").alias("m")
    )
    e = ev.join(F.broadcast(mu), ev.event_type == mu.mu_type)
    decile = (F.col("user_id") % 10).cast("double")
    dev = F.col("value") - F.col("m")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd"),
        F.round(F.var_samp("value"), 4).alias("variance"),
        F.round(F.corr(F.col("value"), decile), 4).alias("corr_decile"),
        F.round(F.covar_samp(F.col("value"), decile), 4).alias("covar_decile"),
        F.round(
            F.avg(F.pow(dev, 3)) / F.pow(F.avg(F.pow(dev, 2)), 1.5), 4
        ).alias("skew_m3"),
    )


@query(
    "q_from_xml",
    oracle="""
    SELECT event_id, event_type AS parsed_type, ROUND(value, 4) AS parsed_value
    FROM events WHERE event_id < 1500
    """,
)
def q_from_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (from_xml, Spark 4): serialize each event
    to an XML fragment and parse it back with a declared schema — the
    round trip proves the parser; the oracle checks the recovered
    values against the originals (shortest-repr double → string → 
    double is exact, so the comparison is bit-identical).

    Scale: from_xml is a row-local JVM expression (no UDF, no Python);
    parsing a 100 TB XML feed is a map-only scan stage."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1500)
    xml = F.concat(
        F.lit("<e><t>"), F.col("event_type"),
        F.lit("</t><v>"), F.col("value").cast("string"), F.lit("</v></e>"),
    )
    parsed = F.from_xml(xml, "t string, v double")
    return ev.select(
        "event_id",
        parsed.getField("t").alias("parsed_type"),
        F.round(parsed.getField("v"), 4).alias("parsed_value"),
    )


@query(
    "q_calendar_dim",
    oracle="""
    SELECT d                                   AS day,
           CAST(year(d) AS BIGINT)             AS year,
           CAST(month(d) AS BIGINT)            AS month,
           CAST(isodow(d) AS BIGINT)           AS iso_dow,
           (isodow(d) >= 6)                    AS is_weekend,
           CAST(date_trunc('month', d) AS DATE) AS month_start,
           CAST(last_day(d) AS DATE)           AS month_end
    FROM (
      SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-03-31',
                                    INTERVAL 1 DAY))::DATE AS d
    )
    """,
)
def q_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generation — the date spine every warehouse
    joins against, built entirely from sequence()+explode (no driver
    loop, no source table): one row per day with the standard derived
    attributes. ISO day-of-week is computed portably ((dayofweek+5)%7+1
    in Spark == isodow in DuckDB, Monday=1).

    Scale: generation is O(|days|) — trivially small forever; the point
    is the pattern (a generated dimension is a DataFrame like any
    other, broadcast into fact joins)."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    iso_dow = ((F.dayofweek("day") + 5) % 7 + 1).cast("long")
    return days.select(
        "day",
        F.year("day").cast("long").alias("year"),
        F.month("day").cast("long").alias("month"),
        iso_dow.alias("iso_dow"),
        (iso_dow >= 6).alias("is_weekend"),
        F.date_trunc("month", F.col("day")).cast("date").alias("month_start"),
        F.last_day("day").alias("month_end"),
    )


@query(
    "q_sql_udf_library",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net_revenue,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS gross_revenue,
           CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bulk
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_sql_udf_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDFs (Spark 4 `CREATE FUNCTION ... RETURN expr`): a small
    reusable business-logic library — net price, gross price, bulk
    flag — declared once and used in a revenue rollup.

    Why this matters at scale: SQL UDFs are INLINED by Catalyst at
    analysis time, so unlike any Python UDF they cost nothing — the
    plan below is byte-identical to writing the expressions inline
    (whole-stage codegen, pushdown, everything) while callers share
    one definition. This is the right home for shared business logic;
    the Python UDF surface (operators/udfs.py) is only for logic SQL
    cannot express. The oracle runs the inlined form — identical
    results prove the inlining semantics."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_udf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION gross_price(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN net_price(p, d) * (1 + t)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_bulk(q DOUBLE) "
        "RETURNS BOOLEAN RETURN q >= 30"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(SUM(net_price(l_extendedprice, l_discount)), 2)
                 AS net_revenue,
               ROUND(SUM(gross_price(l_extendedprice, l_discount, l_tax)), 2)
                 AS gross_revenue,
               CAST(SUM(CASE WHEN is_bulk(l_quantity) THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bulk
        FROM _li_udf GROUP BY l_returnflag
        """
    )


@query(
    "q_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    """,
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 / GoogleSQL 2024 `|>` operators): the
    same filtered aggregation as classic SQL, written as a linear
    pipeline — FROM … |> WHERE … |> AGGREGATE … GROUP BY … |> WHERE.
    Each pipe stage parses to exactly the Catalyst operators the
    classic form produces (one logical plan, identical physical
    strategies — the post-aggregation |> WHERE is the HAVING), so
    this is a front-end surface guarantee: a user migrating pipe-
    syntax queries keeps plan parity, proven by the classic-SQL
    oracle."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     ROUND(SUM(o_totalprice), 2) AS revenue,
                     ROUND(AVG(o_totalprice), 2) AS avg_price
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> SELECT o_orderpriority, n_orders, revenue, avg_price
        """
    )
