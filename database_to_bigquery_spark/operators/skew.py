"""Skew handling: salted joins (and the AQE story).

A shuffled equi-join places every row of a key on one reducer; a hot
key turns that reducer into the job's critical path. Two remedies this
engine relies on:

* **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on in
  session.py): Spark splits oversized partitions at runtime —
  zero-code, the default answer.
* **Explicit salting** (this module): when AQE can't help (aggregating
  state per key, or joins where one side can be cheaply replicated),
  append a salt in [0, S) to the big side's key and replicate the
  small side S×; the hot key's rows spread over S reducers. Join
  output is identical — salting is a physical rewrite, which is why
  the query below can be oracle-checked against the unsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table, range_fanout
from ..registry import query

DEFAULT_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    n_salts: int = DEFAULT_SALT,
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key` with the big side salted and
    the small side replicated n_salts×. Result is row-identical to the
    plain join; the hot keys of `big` are spread across n_salts
    reducers. `salt_source` defaults to a hash of all big-side columns
    (any per-row expression works — it only needs to spread rows, not
    be stable)."""
    salt = (
        F.pmod(salt_source if salt_source is not None else F.hash(*big.columns), n_salts)
        if n_salts > 1
        else F.lit(0)
    )
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "__salt"], how).drop("__salt")


@query(
    "q_salted_hot_key_join",
    oracle="""
    WITH per_type AS (
      SELECT event_type, COUNT(*) AS type_total
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           COUNT(*)                         AS n_events,
           CAST(MIN(type_total) AS BIGINT)  AS type_total
    FROM events e JOIN per_type USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_salted_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on a genuinely low-cardinality (hence maximally
    skewed) key: events ⋈ per-type totals on event_type — 5 distinct
    keys, so an unsalted shuffle join uses at most 5 reducers
    regardless of cluster size. Salting spreads each key over
    DEFAULT_SALT reducers; the oracle checks the rewrite changes
    nothing semantically.

    (At this fixture size Spark would broadcast the small side anyway;
    the salted path is exercised explicitly because at 100 TB the
    "small" side of a hot-key join is often itself too big to
    broadcast.)
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    per_type = ev.groupBy("event_type").agg(F.count("*").alias("type_total"))
    joined = salted_join(ev, per_type, "event_type")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("type_total").alias("type_total"),
    )


@query(
    "q_salted_two_phase_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT)       AS n,
           ROUND(SUM(l_quantity), 2)      AS sum_qty,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_salted_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation: the rewrite for aggregating on a
    key with pathological skew (here l_returnflag — 3 values over the
    whole fact table). Phase 1 groups on (key, salt) with a random-ish
    but deterministic 16-way salt so the hot key spreads over 16
    reducers; phase 2 re-aggregates the 16 partials per key. All
    aggregates used are algebraic (count→sum, sum→sum, max→max) so the
    two-phase result is EXACTLY the direct groupBy — which is what the
    oracle computes.

    (Spark's partial aggregation already handles most of this
    map-side; the explicit salt matters when per-key state is too big
    for one reducer — giant count-distinct sets, collect_lists — or
    under AQE-less engines. The operator documents and tests the
    rewrite; the plan costs one extra tiny shuffle of 3×16 rows.)"""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", (F.col("l_orderkey") % 16).cast("int"))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum("l_quantity").alias("pq"),
        F.max("l_extendedprice").alias("pm"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").cast("long").alias("n"),
        F.round(F.sum("pq"), 2).alias("sum_qty"),
        F.round(F.max("pm"), 2).alias("max_price"),
    )


@query(
    "q_global_ranks_scalable",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
             AS decile,
           ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6)
             AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey), 6)
             AS cume
    FROM orders
    """,
)
def q_global_ranks_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global ranks WITHOUT a single-partition window — the
    scale rewrite of q_ntile_stats (whose stock `Window.orderBy()`
    funnels the whole table through one task).

    Two-phase: (1) repartitionByRange on the sort key (sampled
    boundaries — a parallel distributed sort), rank locally inside each
    range partition; (2) offset every partition's local ranks by the
    cumulative row count of the partitions before it. The offsets come
    from a per-partition count — O(#partitions) rows, so its own
    cumulative window is microscopic (that tiny 32-row stage is the
    only SinglePartition in the plan, by design) — broadcast-joined
    back. With a unique sort key, rank == row_number, so
    percent_rank = (r-1)/(n-1), cume_dist = r/n, and NTILE's
    uneven-bucket rule is pure arithmetic on r and n."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # persist() pins the range partitioning across the two consumers
    # (probe + broadcast offsets). The offsets subtree executes as its
    # own job; without a shared materialization it relies on exchange
    # reuse, and RangePartitioner re-samples boundaries per exchange
    # instance — any schema-pruning asymmetry between the branches
    # would silently corrupt the offsets (bitten in q_decile_lift).
    ranged = (
        o.repartitionByRange(range_fanout(o), "o_totalprice", "o_orderkey")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    local = ranged.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
        ),
    )
    counts = local.groupBy("pid").agg(F.count("*").alias("c"))
    offsets = counts.withColumn(
        "off",
        F.coalesce(
            F.sum("c").over(
                W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn("n", F.sum("c").over(W.partitionBy()))
    r = F.col("off") + F.col("rn")  # global 1-based rank
    n = F.col("n")
    k = F.lit(10)
    big = F.ceil(n / k)  # size of the first (n % k) buckets
    small = F.floor(n / k)
    cut = (n % k) * big  # ranks <= cut fall in the big buckets
    decile = F.when(r <= cut, F.floor((r - 1) / big) + 1).otherwise(
        (n % k) + F.floor((r - cut - 1) / small) + 1
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "o_orderkey",
            decile.cast("long").alias("decile"),
            F.round((r - F.lit(1)) / (n - F.lit(1)), 6).alias("pct_rank"),
            F.round(r / n, 6).alias("cume"),
        )
    )
