"""Relational core: projection/filter, joins (equi/semi/anti/outer/
range), aggregation (hash agg, rollup/cube, approx), windows, sort/
limit/top-k, set ops, scalar functions (SURVEY.md §2b X1-X11).

The reference delegates all of this to MySQL/BigQuery (SURVEY.md §2a
"explicitly absent"); here each operator is a declarative DataFrame
plan so Catalyst applies pushdown/pruning/join-selection and AQE picks
runtime strategies. Scale notes per query explain why the plan holds
at 100 TB (broadcastable dims, partial aggs, no driver materialization).

Oracle-matching conventions (see registry.py): identical ROUND on both
sides for float aggregates; BIGINT casts for integer sums; unique
tie-breaks in every ranking/limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query


# ---------------------------------------------------------------- X1 ----
@query(
    "q1_pricing_summary",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)         AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)    AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)      AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)      AS avg_disc,
           COUNT(*)                                                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over the fact table.

    Scale: single shuffle on a 6-value grouping key; partial (map-side)
    aggregation shrinks it to ~6 rows per task before exchange. Filter
    + column pruning reach the parquet scan.

    Money sums run in exact DECIMAL (the 2-4-6-decimal true values are
    recovered by the cast, then summed exactly) — deterministic under
    any partitioning and identical to the oracle bit-for-bit; see
    registry.py conventions.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count("*")
    sum_qty = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    sum_price = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    sum_disc = F.sum(F.col("l_discount").cast("decimal(18,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.cast("double").alias("sum_qty"),
            sum_price.cast("double").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            F.round(sum_qty.cast("double") / n, 4).alias("avg_qty"),
            F.round(sum_price.cast("double") / n, 4).alias("avg_price"),
            F.round(sum_disc.cast("double") / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           CAST(l_quantity AS BIGINT)                   AS qty_int
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_discount > 0.05 AND l_quantity < 10
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: projection + conjunctive filter + expression eval.

    Scale: narrow (no shuffle); all three predicates and the 5-column
    projection push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") > 0.05)
            & (F.col("l_quantity") < 10)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
            F.col("l_quantity").cast("long").alias("qty_int"),
        )
    )


# ---------------------------------------------------------------- X2 ----
@query(
    "q3_shipping_priority",
    headline=True,
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k.

    Scale: customer (filtered to one segment) broadcasts; orders⋈lineitem
    is the one big shuffle, on the join key that the aggregation reuses.
    Top-10 is a TakeOrdered — no global sort materialization.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    headline=True,
    oracle="""
    SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, local-supplier constraint.

    Scale: region/nation/supplier/customer are dimensions → broadcast;
    the only shuffle is orders⋈lineitem. The c_nationkey = s_nationkey
    constraint rides the same join, no extra exchange.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nr = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    snr = supplier.join(F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(snr), li.l_suppkey == snr.s_suppkey)
        .join(
            F.broadcast(customer),
            (orders.o_custkey == customer.c_custkey)
            & (snr.s_nationkey == customer.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-scalar-aggregate (no shuffle
    beyond the single-row final agg); every predicate pushes to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    headline=True,
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.

    Scale: nation broadcasts; customer joins after the orders⋈lineitem
    shuffle so the agg groups on already-colocated keys; final top-20
    via TakeOrdered.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_outer_join_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_outer_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: left outer join preserving customers with zero orders.

    Scale: shuffle join on custkey; COUNT(col) (not *) keeps outer-null
    semantics identical to SQL.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "q_full_outer_nations",
    oracle="""
    SELECT COALESCE(c.k, s.k)   AS nationkey,
           COALESCE(c.nc, 0)    AS n_customers,
           COALESCE(s.ns, 0)    AS n_suppliers
    FROM (SELECT c_nationkey AS k, COUNT(*) AS nc FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS ns FROM supplier GROUP BY 1) s
      ON c.k = s.k
    """,
)
def q_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: full outer join of two pre-aggregated sides (aggregate
    before join → the outer join runs on tiny inputs at any scale)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("nc"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("ns"))
    )
    return c.join(s, "k", "full").select(
        F.col("k").alias("nationkey"),
        F.coalesce("nc", F.lit(0)).alias("n_customers"),
        F.coalesce("ns", F.lit(0)).alias("n_suppliers"),
    )


# ---------------------------------------------------------------- X3 ----
@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: left-semi join (EXISTS). Scale: semi-join short-circuits on
    first match; high-price filter pushes into the probe scan."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: left-anti join (NOT EXISTS) — customers who never ordered."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------- X4 ----
@query(
    "q_range_join_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0), ('premium', 1200.0, 100000.0)
    )
    SELECT band, COUNT(*) AS n_parts, ROUND(SUM(p_retailprice), 2) AS total_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: theta/range join against a tiny banding table.

    Scale: the band table is bounded → broadcast-nested-loop with 3
    comparisons per row; never a cartesian on two big sides.
    """
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
        )
    )


@query(
    "q_self_theta_join",
    oracle="""
    SELECT a.o_orderkey AS okey_small, b.o_orderkey AS okey_big
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND b.o_totalprice > a.o_totalprice * 10
    WHERE a.o_totalprice > 1000 AND a.o_orderstatus = 'F' AND b.o_orderstatus = 'F'
    """,
)
def q_self_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: self theta-join — order pairs of one customer where one is
    10× the other. Scale: the equi part (custkey) drives a hash join;
    theta predicates evaluate post-match, so no cartesian blowup."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    a = o.filter(F.col("o_totalprice") > 1000).alias("a")
    b = o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("b.o_totalprice") > F.col("a.o_totalprice") * 10),
        )
        .select(
            F.col("a.o_orderkey").alias("okey_small"),
            F.col("b.o_orderkey").alias("okey_big"),
        )
    )


# ---------------------------------------------------------------- X5 ----
@query(
    "q_hash_agg_functions",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                                   AS n_orders,
           COUNT(DISTINCT o_custkey)                  AS n_customers,
           ROUND(SUM(o_totalprice), 2)                AS sum_price,
           ROUND(AVG(o_totalprice), 4)                AS avg_price,
           ROUND(MIN(o_totalprice), 2)                AS min_price,
           ROUND(MAX(o_totalprice), 2)                AS max_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4)        AS sd_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_hash_agg_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: the aggregate-function battery with map-side partial agg.
    COUNT DISTINCT expands to a two-phase exchange automatically."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
    )


# ---------------------------------------------------------------- X6 ----
@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT)        AS n_rows,
           ROUND(SUM(l_quantity), 2)       AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: hierarchical subtotals (flag → flag+status → grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT)    AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: full cube over two dimensions."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "q_conditional_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_open,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_finished
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_conditional_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: pivot expressed as conditional aggregation (the portable,
    shuffle-identical form of groupBy().pivot())."""
    li = load_table(spark, sf_dir, "lineitem")
    is_o = F.when(F.col("l_linestatus") == "O", 1).otherwise(0)
    is_f = F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
    qty_o = F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)
    qty_f = F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)
    return li.groupBy("l_returnflag").agg(
        F.sum(is_o).cast("long").alias("n_open"),
        F.sum(is_f).cast("long").alias("n_finished"),
        F.round(F.sum(qty_o), 2).alias("qty_open"),
        F.round(F.sum(qty_f), 2).alias("qty_finished"),
    )


# ---------------------------------------------------------------- X7 ----
@query("q_approx_count_distinct")  # approx ≠ oracle-exact → rows-only check
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: HyperLogLog++ distinct estimate per event type.

    Scale: constant-size sketch per group mergeable across executors —
    the 100 TB-safe way to count distincts. Approximate by design, so
    no value oracle (driver records rows-only).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4)  AS p50_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`). The approx path for 100 TB is
    percentile_approx (t-digest-style sketch) — exercised in tests;
    the exact form is what's oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
    )


# ---------------------------------------------------------------- X8 ----
@query(
    "q_window_rank",
    headline=True,
    oracle="""
    SELECT c_custkey, o_orderkey, rn, rk
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK()       OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rk
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: ranking windows with unique tie-break; top-3 orders per
    customer. Scale: one shuffle on the partition key; AQE handles a
    skewed customer."""
    o = load_table(spark, sf_dir, "orders")
    w_price = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    w_status = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.row_number().over(w_price).alias("rn"),
            F.rank().over(w_status).alias("rk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_running",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER w_run, 2) AS running_qty,
           ROUND(COALESCE(LAG(l_extendedprice) OVER w, 0.0), 2) AS prev_price,
           ROUND(COALESCE(LEAD(l_extendedprice) OVER w, 0.0), 2) AS next_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_quantity),
           w_run AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: running sum + lag/lead with explicit ROWS frame.

    (l_orderkey, l_linenumber) is NOT unique in the fixture, so the
    ordering adds the value columns themselves as tie-breaks — rows
    that still tie are interchangeable for every output column, making
    the result deterministic under any partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice", "l_quantity")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(run), 2).alias("running_qty"),
        F.round(F.coalesce(F.lag("l_extendedprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
        F.round(F.coalesce(F.lead("l_extendedprice").over(w), F.lit(0.0)), 2).alias("next_price"),
    )


# ---------------------------------------------------------------- X9 ----
@query(
    "q_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    ) WHERE rn <= 2
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9: top-k per group via ranking window (the scalable idiom —
    no per-group collect)."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9: global top-100 — Spark plans TakeOrderedAndProject (per-
    partition heaps + driver merge), not a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------- X10 ----
@query(
    "q_set_ops",
    oracle="""
    SELECT 'both' AS side, k FROM (
      SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS side, k FROM (
      SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: INTERSECT / EXCEPT / UNION ALL over nation-key projections."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    both = c.intersect(s).select(F.lit("both").alias("side"), "k")
    # subtract == EXCEPT (distinct) — exceptAll would keep values that
    # appear in both sides with higher multiplicity on the left
    only = c.subtract(s).select(F.lit("customer_only").alias("side"), "k")
    return both.unionByName(only)


@query(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: distinct = hash aggregation without aggregates (partial
    distinct runs map-side before the exchange)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_shipdate"
    ).distinct()


# --------------------------------------------------------------- X11 ----
@query(
    "q_scalar_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                                    AS brand_upper,
           SUBSTR(p_name, 1, 8)                              AS name_prefix,
           CAST(LENGTH(p_name) AS INT)                       AS name_len,
           p_brand || '/' || p_type                          AS brand_type,
           ROUND(ABS(p_retailprice - 1000.0), 2)             AS price_dist,
           CAST(FLOOR(p_retailprice / 100.0) AS BIGINT)      AS price_bucket,
           ROUND(SQRT(p_retailprice), 4)                     AS price_sqrt,
           CAST(p_size % 7 AS INT)                           AS size_mod
    FROM part
    WHERE p_size >= 10
    """,
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: string/math scalar battery — all JVM-side, whole-stage
    codegen'd (no Python in the row path)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_dist"),
        F.floor(F.col("p_retailprice") / 100.0).alias("price_bucket"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
    )


@query(
    "q_date_functions",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT)    AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)   AS mo,
           CAST(COUNT(*) AS BIGINT)                       AS n_orders,
           ROUND(SUM(o_totalprice), 2)                    AS sum_price
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
    GROUP BY 1, 2
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: date-part extraction feeding an aggregation."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("date")
    )
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: JSON scalar extraction from the events props column
    (get_json_object — JVM-side JsonPath, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.avg(F.get_json_object("props", "$.k").cast("double")), 4
        ).alias("avg_k"),
    )


@query(
    "q_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)                                   AS dim,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
           ROUND(SQRT(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS vec_norm
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11/X15: higher-order array functions over the embedding column
    (F.aggregate/F.transform run inside codegen — no UDF for vector
    arithmetic)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_sum = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x)
    vec_sq = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(vec_sum, 4).alias("vec_sum"),
        F.round(F.sqrt(vec_sq), 4).alias("vec_norm"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
             AS rolling_1h_value,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling_1h_events
    FROM events
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: RANGE frame over event time — per-user rolling 1-hour sum
    and count (the "rate over trailing window" primitive behind every
    rate limiter / anomaly detector).

    RANGE frames bound by *value* distance need a numeric order key in
    Spark: order by epoch seconds and bound with rangeBetween(-3600, 0)
    — identical semantics to the oracle's INTERVAL frame, including
    same-timestamp rows all sharing one frame (where a ROWS frame
    would depend on tie order). One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 2).alias("rolling_1h_value"),
        F.count("*").over(w).alias("rolling_1h_events"),
    )


@query(
    "q_ntile_stats",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS decile,
           ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey), 6)    AS cume
    FROM orders
    """,
    scale_twin="q_global_ranks_scalable",
)
def q_ntile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: distribution-ranking windows — decile assignment,
    percent_rank, cume_dist over order totals (tie-broken by key so
    both engines agree).

    Scale note: a global ORDER BY window is one range-partitioned sort
    (Spark samples boundaries, so it parallelizes) but is still the
    most expensive window shape; at 100 TB prefer percentile_approx
    cutpoints joined back (q_percentiles) when exact ranks aren't
    required."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_array_agg_ordered",
    oracle="""
    SELECT n_nationkey,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           CAST(COUNT(*) AS BIGINT)                AS n_suppliers
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_nationkey
    """,
)
def q_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: ordered array aggregation — collect supplier names per
    nation into a deterministic sorted list, serialized for comparison.
    collect_list order is partition-arrival order (nondeterministic),
    so the canonical Spark idiom is collect_list → array_sort —
    sorting per group after the shuffle, never a global sort."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count("*").alias("n_suppliers"),
        )
    )


@query(
    "q_set_ops_all",
    oracle="""
    SELECT 'intersect_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS k FROM supplier) GROUP BY k
    UNION ALL
    SELECT 'except_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS k FROM supplier) GROUP BY k
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: the multiset (bag) set operations — INTERSECT ALL keeps
    min(multiplicity), EXCEPT ALL subtracts multiplicities; both are
    one hash aggregate per side plus a join in Spark's physical plan
    (no sort), complementing q_set_ops' distinct forms."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    ia = (
        c.intersectAll(s)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    ea = (
        c.exceptAll(s)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return ia.unionByName(ea)
