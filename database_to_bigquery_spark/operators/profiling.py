"""Data-profiling / data-quality operators.

The reference's only quality mechanism is row-count audit logging
(reference ``mysql_operations.py:33``, ``bigquery_operations.py:46-48``)
and a schema-presence assertion (``bigquery_operations.py:11-12``).
These operators generalize that into the two standard pipeline gates:
a per-column statistical profile and a declarative rule-violation
report — the checks a 100 TB ingest runs before promoting a batch.

  q_profile_columns      per-column null/distinct profile of orders
  q_data_quality_checks  named rule → violation count over lineitem
  q_mode_per_group       deterministic most-frequent-value per group
  q_category_entropy     Shannon entropy of categorical columns

Scale design: both are a SINGLE scan producing one aggregate row that
is then exploded driver-free into the long report shape (inline over a
struct array). A naive per-column/per-rule UNION ALL re-scans the table
k times — at 100 TB that is k× the I/O for the same answer. (The
DuckDB oracles use the UNION ALL form deliberately: same values,
different plan, which is exactly what the equivalence check wants.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query

_PROFILE_COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           COUNT(*) - COUNT(o_custkey) AS n_nulls,
           COUNT(DISTINCT o_custkey)   AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority) FROM orders
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (null count, exact distinct count) for four
    orders columns, computed in ONE scan: a single aggregate row with
    2×k measures, exploded to the long (col_name, n_nulls, n_distinct)
    report via inline() — no driver loop, no re-scan per column. At
    100 TB swap count_distinct for approx_count_distinct (the
    q_approx_count_distinct / q_hll_sketch_union operators) column by
    column; the report shape stays identical."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
    row = o.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return row.select(F.inline(structs))


_RULES: list[tuple[str, str]] = [
    # (rule name, SQL predicate that flags a VIOLATING row) — shared
    # verbatim between the Spark side (F.expr) and the DuckDB oracle.
    ("quantity_in_range", "l_quantity < 1 OR l_quantity > 50"),
    ("discount_in_unit_interval", "l_discount < 0 OR l_discount > 1"),
    ("price_positive", "l_extendedprice <= 0"),
    ("shipdate_present", "l_shipdate IS NULL"),
    ("no_heavy_discount", "l_discount > 0.05"),
    ("linenumber_positive", "l_linenumber < 1"),
]


@query(
    "q_data_quality_checks",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, CAST(COUNT(*) FILTER (WHERE {pred}) AS BIGINT)"
        " AS n_violations FROM lineitem"
        for name, pred in _RULES
    ),
)
def q_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite: each named rule is a violation
    predicate; output is (rule, n_violations). All rules evaluate in
    one scan as conditional sums on the same aggregate row, then
    explode to the report — adding a rule adds one expression, not one
    pass. The predicate strings are shared verbatim with the oracle, so
    the rule *semantics* (not a re-implementation) are what's checked."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        *[
            F.sum(F.expr(pred).cast("long")).alias(f"r{i}")
            for i, (_, pred) in enumerate(_RULES)
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.coalesce(F.col(f"r{i}"), F.lit(0)).cast("long").alias("n_violations"),
            )
            for i, (name, _) in enumerate(_RULES)
        ]
    )
    return row.select(F.inline(structs))


@query(
    "q_mode_per_group",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY COUNT(*) DESC, o_orderpriority
             ) AS rn
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    )
    WHERE rn = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order priority per status — mode with a
    DETERMINISTIC tie-break (count desc, then value asc), unlike the
    built-in mode() whose tie winner is arbitrary and would flap the
    value-hash between engines. Two-level shape: the big aggregate
    combines map-side; the ranking window runs on |groups| rows."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


@query(
    "q_category_entropy",
    oracle="""
    WITH c1 AS (SELECT o_orderstatus AS v, COUNT(*) AS c FROM orders GROUP BY 1),
    c2 AS (SELECT o_orderpriority AS v, COUNT(*) AS c FROM orders GROUP BY 1),
    p1 AS (SELECT CAST(c AS DOUBLE) / SUM(c) OVER () AS p FROM c1),
    p2 AS (SELECT CAST(c AS DOUBLE) / SUM(c) OVER () AS p FROM c2)
    SELECT 'o_orderstatus' AS col_name,
           CAST(COUNT(*) AS BIGINT)               AS n_values,
           ROUND(-SUM(p * LN(p) / LN(2)), 6)      AS entropy_bits
    FROM p1
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           ROUND(-SUM(p * LN(p) / LN(2)), 6)
    FROM p2
    """,
)
def q_category_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of categorical columns — the profiler
    metric that separates near-constant columns (entropy ≈ 0, candidates
    for dictionary encoding / partition keys) from high-cardinality ones.

    Shape per column: value-counts aggregate (map-side combined), then
    the entropy sum runs over |distinct values| rows — the p*log p fold
    never touches raw data. Both columns come from one scan."""
    o = load_table(spark, sf_dir, "orders")

    from pyspark.sql import Window

    def ent(col: str) -> DataFrame:
        counts = o.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("c"))
        # p as a window column first (Spark disallows a window inside an
        # aggregate); the whole-partition window runs over |values| rows
        p = (F.col("c") / F.sum("c").over(Window.partitionBy())).alias("p")
        return counts.select("v", p).agg(
            F.lit(col).alias("col_name"),
            F.count("*").cast("long").alias("n_values"),
            F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("entropy_bits"),
        )

    return ent("o_orderstatus").unionByName(ent("o_orderpriority"))


# ------------------------------------------------- drift detection ----

_PSI_BINS = 10


@query(
    "q_psi_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE WHEN LENGTH(source) = 4 THEN 'a' ELSE 'b' END AS grp, n_chars
      FROM documents),
    bounds AS (
      SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM tagged),
    binned AS (
      SELECT grp,
             LEAST({_PSI_BINS - 1},
                   CAST(FLOOR((n_chars - mn) / ((mx - mn + 1) / {_PSI_BINS}.0)) AS INT)) AS bin
      FROM tagged CROSS JOIN bounds),
    counts AS (
      SELECT bin,
             COUNT(*) FILTER (WHERE grp = 'a') AS na,
             COUNT(*) FILTER (WHERE grp = 'b') AS nb
      FROM binned GROUP BY bin),
    tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM counts),
    probs AS (
      SELECT bin, na, nb,
             (na + 0.5) / (ta + {_PSI_BINS * 0.5}) AS pa,
             (nb + 0.5) / (tb + {_PSI_BINS * 0.5}) AS pb
      FROM counts CROSS JOIN tot)
    SELECT CAST(bin AS INT) AS bin, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           ROUND(pa, 6) AS pa, ROUND(pb, 6) AS pb,
           ROUND((pa - pb) * LN(pa / pb), 6) AS psi_term,
           ROUND(SUM((pa - pb) * LN(pa / pb)) OVER (), 6) AS psi_total
    FROM probs
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between two corpus
    slices (sources src0-9 vs src10+), binned on document length — the
    distribution-shift gate a training-data pipeline runs between
    ingest snapshots before mixing them (PSI < 0.1 stable, 0.1-0.25
    moderate shift, > 0.25 investigate). Laplace-smoothed (+0.5/bin) so
    empty bins contribute finite terms.

    Scale: one scan → 1-row global min/max broadcast back for the bin
    edges → one groupBy(bin) with conditional counts (map-side
    partial) → arithmetic over {_PSI_BINS} rows. The per-bin report and
    the windowed total ride the same {_PSI_BINS}-row frame; nothing
    rescans the corpus. Works unchanged for any numeric column and any
    pair of snapshot predicates."""
    d = load_table(spark, sf_dir, "documents").select(
        F.when(F.length("source") == 4, "a").otherwise("b").alias("grp"), "n_chars"
    )
    bounds = d.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    width = (F.col("mx") - F.col("mn") + 1) / float(_PSI_BINS)
    binned = d.join(F.broadcast(bounds)).select(
        "grp",
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor((F.col("n_chars") - F.col("mn")) / width).cast("int"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("grp") == "a", 1)).alias("na"),
        F.count(F.when(F.col("grp") == "b", 1)).alias("nb"),
    )
    # totals as a window over the 10-row bin frame, NOT a separate
    # aggregate joined back: the agg+join form re-executes the corpus
    # scan per consumer (4 scans total); the window keeps it at the
    # 2-scan minimum for this formulation (bounds + binning)
    smooth = _PSI_BINS * 0.5
    wall = W.partitionBy()
    probs = counts.select(
        "bin",
        "na",
        "nb",
        ((F.col("na") + 0.5) / (F.sum("na").over(wall) + smooth)).alias("pa"),
        ((F.col("nb") + 0.5) / (F.sum("nb").over(wall) + smooth)).alias("pb"),
    )
    term = (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))
    return probs.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.round("pa", 6).alias("pa"),
        F.round("pb", 6).alias("pb"),
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(W.partitionBy()), 6).alias("psi_total"),
    )


@query(
    "q_ks_test",
    oracle="""
    WITH tagged AS (
      SELECT CASE WHEN LENGTH(source) = 4 THEN 'a' ELSE 'b' END AS grp, n_chars
      FROM documents),
    tot AS (
      SELECT COUNT(*) FILTER (WHERE grp = 'a') AS ta,
             COUNT(*) FILTER (WHERE grp = 'b') AS tb
      FROM tagged),
    vals AS (
      SELECT n_chars AS x,
             COUNT(*) FILTER (WHERE grp = 'a') AS ca,
             COUNT(*) FILTER (WHERE grp = 'b') AS cb
      FROM tagged GROUP BY n_chars),
    cdf AS (
      SELECT x,
             SUM(ca) OVER (ORDER BY x) * 1.0 / ta AS fa,
             SUM(cb) OVER (ORDER BY x) * 1.0 / tb AS fb
      FROM vals CROSS JOIN tot)
    SELECT ROUND(MAX(ABS(fa - fb)), 6) AS ks_stat,
           CAST((SELECT ta FROM tot) AS BIGINT) AS n_a,
           CAST((SELECT tb FROM tot) AS BIGINT) AS n_b,
           MAX(ABS(fa - fb))
             > 1.358 * SQRT((ta + tb) * 1.0 / (ta * tb)) AS reject_95
    FROM cdf CROSS JOIN tot GROUP BY ta, tb
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the same corpus
    slices as q_psi_drift (src0-9 vs src10+), on document length: the
    nonparametric distribution-shift detector — KS statistic = max gap
    between the two empirical CDFs, with the 95% rejection threshold
    1.358·√((n+m)/(n·m)). PSI reports *where* the mass moved (binned);
    KS answers *whether* the distributions differ, bin-free.

    Scale: group to distinct values first (one partial-aggregated
    shuffle on the value — the CDF support, ≪ corpus), then one
    range-partitioned ordered window over the support builds both CDFs
    in a single pass; the max-gap reduce is 1 row out. No corpus-sized
    sort anywhere."""
    d = load_table(spark, sf_dir, "documents").select(
        F.when(F.length("source") == 4, "a").otherwise("b").alias("grp"), "n_chars"
    )
    vals = d.groupBy(F.col("n_chars").alias("x")).agg(
        F.count(F.when(F.col("grp") == "a", 1)).alias("ca"),
        F.count(F.when(F.col("grp") == "b", 1)).alias("cb"),
    )
    wall = W.partitionBy()
    wcdf = W.orderBy("x").rowsBetween(W.unboundedPreceding, 0)
    cdf = vals.select(
        "x",
        "ca",
        "cb",
        (F.sum("ca").over(wcdf) * 1.0 / F.sum("ca").over(wall)).alias("fa"),
        (F.sum("cb").over(wcdf) * 1.0 / F.sum("cb").over(wall)).alias("fb"),
        F.sum("ca").over(wall).alias("ta"),
        F.sum("cb").over(wall).alias("tb"),
    )
    gap = F.abs(F.col("fa") - F.col("fb"))
    return (
        cdf.groupBy("ta", "tb")
        .agg(F.max(gap).alias("d"))
        .select(
            F.round("d", 6).alias("ks_stat"),
            F.col("ta").cast("long").alias("n_a"),
            F.col("tb").cast("long").alias("n_b"),
            (
                F.col("d")
                > 1.358 * F.sqrt((F.col("ta") + F.col("tb")) * 1.0 / (F.col("ta") * F.col("tb")))
            ).alias("reject_95"),
        )
    )


@query(
    "q_gini_concentration",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, ROUND(SUM(o_totalprice), 2) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, c_custkey) AS i FROM spend)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(x), 2) AS total_spend,
           ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    """,
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the concentration metric
    behind revenue-dependency and data-source-imbalance monitoring
    (0 = perfectly even, →1 = one whale): G = 2·Σ(rank·xᵢ)/(n·Σx) −
    (n+1)/n over ascending-sorted values, ties broken by key for
    cross-engine determinism.

    Scale: spend is one join + groupBy reduce; the ranking runs over
    the aggregated per-customer relation, orders of magnitude smaller
    than the fact table. The global ORDER BY window is a range-
    partitioned sort; for key spaces where even that is too hot, the
    two-phase offset pattern of q_global_ranks_scalable computes the
    same Σ(rank·x) without a single-partition stage."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("x"))
    )
    ranked = spend.withColumn(
        "i", F.row_number().over(W.orderBy("x", "c_custkey"))
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.round(F.sum("x"), 2).alias("total_spend"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.count("*") * F.sum("x"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
    )


@query(
    "q_chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT event_type, CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS bucket,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2),
    margins AS (
      SELECT event_type, bucket, o,
             SUM(o) OVER (PARTITION BY event_type) AS row_tot,
             SUM(o) OVER (PARTITION BY bucket) AS col_tot,
             SUM(o) OVER () AS n
      FROM obs),
    cells AS (
      SELECT *, row_tot * col_tot * 1.0 / n AS e FROM margins)
    SELECT ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT bucket) - 1) AS BIGINT) AS dof,
           ROUND(SQRT(SUM((o - e) * (o - e) / e) / (MAX(n) *
                 LEAST(COUNT(DISTINCT event_type) - 1,
                       COUNT(DISTINCT bucket) - 1))), 6) AS cramers_v
    FROM cells
    """,
)
def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence on the event_type × value-band
    contingency table, with Cramér's V effect size — the categorical
    association check completing the drift/association family
    (q_psi_drift: binned shift, q_ks_test: continuous shift, this:
    categorical dependence).

    Scale: ONE pass builds the contingency table (groupBy both keys,
    map-side combined); margins and expectations are windows over the
    |cells| relation (types × bands — tiny at any corpus size), so the
    statistic costs one corpus shuffle regardless of data volume."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        F.when(F.col("value") >= 50, "hi").otherwise("lo").alias("bucket"),
    ).agg(F.count("*").alias("o"))
    margins = obs.select(
        "event_type",
        "bucket",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(W.partitionBy("bucket")).alias("col_tot"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") * 1.0 / F.col("n")
    cells = margins.withColumn("e", e)
    chi2 = F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
    dof = (F.count_distinct("event_type") - 1) * (F.count_distinct("bucket") - 1)
    v = F.sqrt(
        chi2
        / (
            F.max("n")
            * F.least(
                F.count_distinct("event_type") - 1, F.count_distinct("bucket") - 1
            )
        )
    )
    return cells.agg(
        F.round(chi2, 6).alias("chi2"),
        dof.cast("long").alias("dof"),
        F.round(v, 6).alias("cramers_v"),
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.5) AS m
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, e.value, med.m, ABS(e.value - med.m) AS ad
      FROM events e JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(CAST(ad AS DOUBLE), 0.5) AS mad
      FROM dev GROUP BY 1)
    SELECT d.event_type,
           ROUND(MAX(d.m), 4) AS median_value,
           ROUND(MAX(mad.mad), 4) AS mad,
           CAST(COUNT(*) FILTER (
             WHERE ABS(d.value - d.m) > 3 * 1.4826 * mad.mad) AS BIGINT)
             AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median / MAD (median
    absolute deviation) with the 3σ-equivalent 1.4826 consistency
    factor — the outlier screen that, unlike mean/stddev z-scores,
    isn't dragged by the outliers it's hunting.

    Determinism: exact interpolated medians (percentile ≡ DuckDB
    quantile_cont) rather than approx_percentile, so both engines
    agree bit-for-bit before the single rounded report. Scale: two
    grouped exact percentiles + one broadcast of the per-group
    medians/MADs back onto the stream (groups are few); swap in
    approx_percentile at extreme group cardinality — same plan, the
    report gains a documented error band."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    d = dev.join(F.broadcast(mad), "event_type")
    return d.groupBy("event_type").agg(
        F.round(F.max("m"), 4).alias("median_value"),
        F.round(F.max("mad"), 4).alias("mad"),
        F.count(
            F.when(F.abs(F.col("value") - F.col("m")) > 3 * 1.4826 * F.col("mad"), 1)
        )
        .cast("long")
        .alias("n_outliers"),
        F.count("*").cast("long").alias("n_total"),
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
]


@query(
    "q_corr_matrix",
    oracle="""
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS pearson_r FROM lineitem
    UNION ALL SELECT 'l_quantity', 'l_discount',
           ROUND(corr(l_quantity, l_discount), 4) FROM lineitem
    UNION ALL SELECT 'l_quantity', 'l_tax',
           ROUND(corr(l_quantity, l_tax), 4) FROM lineitem
    UNION ALL SELECT 'l_extendedprice', 'l_discount',
           ROUND(corr(l_extendedprice, l_discount), 4) FROM lineitem
    UNION ALL SELECT 'l_extendedprice', 'l_tax',
           ROUND(corr(l_extendedprice, l_tax), 4) FROM lineitem
    UNION ALL SELECT 'l_discount', 'l_tax',
           ROUND(corr(l_discount, l_tax), 4) FROM lineitem
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (upper triangle) over the
    four numeric lineitem measures, in ONE scan.

    All C(4,2)=6 correlations ride a single partial aggregate — each
    corr() is a 5-accumulator (n, Σx, Σy, Σxy, Σx², Σy²) map-side
    combine, so the whole matrix costs one table pass and one 1-row
    reduce regardless of table size; the long (col_a, col_b, r) report
    shape comes from a driver-free inline() explode of the single
    aggregate row. The DuckDB oracle deliberately uses the k-scan
    UNION ALL form — same values, different plan. At 100 TB the
    single-scan form is 6× less I/O; widening to k columns is
    C(k,2) extra accumulators, not extra passes."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        *[F.corr(a, b).alias(f"c_{i}") for i, (a, b) in enumerate(_CORR_PAIRS)]
    )
    return agg.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.round(F.col(f"c_{i}"), 4).alias("pearson_r"),
                    )
                    for i, (a, b) in enumerate(_CORR_PAIRS)
                ]
            )
        )
    )


@query(
    "q_feature_woe_iv",
    oracle="""
    WITH span AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
    binned AS (
      SELECT LEAST(4, CAST(FLOOR((o_totalprice - lo) * 5.0 / (hi - lo)) AS INT))
               AS bin,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
      FROM orders CROSS JOIN span),
    cells AS (
      SELECT bin,
             CAST(SUM(1 - bad) AS BIGINT) AS n_good,
             CAST(SUM(bad) AS BIGINT)     AS n_bad
      FROM binned GROUP BY bin),
    tot AS (SELECT SUM(n_good) AS g, SUM(n_bad) AS b FROM cells)
    SELECT bin, n_good, n_bad,
           ROUND(LN(((n_good + 0.5) / g) / ((n_bad + 0.5) / b)), 4) AS woe,
           ROUND((CAST(n_good AS DOUBLE) / g - CAST(n_bad AS DOUBLE) / b)
                 * LN(((n_good + 0.5) / g) / ((n_bad + 0.5) / b)), 6) AS iv_term
    FROM cells CROSS JOIN tot
    """,
)
def q_feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value scoring of a numeric
    feature (o_totalprice, 5 fixed-width bins) against a binary label
    (order status F) — the standard credit-scoring feature screen;
    Σ iv_term is the feature's predictive-power score.

    Fixed-width bins (arithmetic from a 1-row min/max broadcast, the
    q_histogram pattern) rather than quantile bins, so binning is a
    map-only expression — no global sort/ntile stage; the +0.5
    continuity correction keeps WoE finite in empty cells. Counts are
    exact integers and min/max are exact selections, so every double
    derives from identical IEEE ops in both engines.

    Scale: one scan → one partial-aggregated shuffle on the 5-value
    bin key → a 1-row totals broadcast. Per-feature cost is one pass;
    k features ride the same scan as k bin columns (the
    q_corr_matrix single-scan widening pattern)."""
    o = load_table(spark, sf_dir, "orders")
    span = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    binned = o.join(F.broadcast(span)).select(
        F.least(
            F.lit(4),
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                * 5.0
                / (F.col("hi") - F.col("lo"))
            ).cast("int"),
        ).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
        F.sum("bad").cast("long").alias("n_bad"),
    )
    tot = cells.agg(F.sum("n_good").alias("g"), F.sum("n_bad").alias("b"))
    woe = F.log(
        ((F.col("n_good") + 0.5) / F.col("g")) / ((F.col("n_bad") + 0.5) / F.col("b"))
    )
    return cells.join(F.broadcast(tot)).select(
        "bin",
        "n_good",
        "n_bad",
        F.round(woe, 4).alias("woe"),
        F.round(
            (
                F.col("n_good").cast("double") / F.col("g")
                - F.col("n_bad").cast("double") / F.col("b")
            )
            * woe,
            6,
        ).alias("iv_term"),
    )
