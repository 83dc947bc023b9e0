"""Property-based round-trip invariants (SURVEY.md §5.4, hypothesis):
the algebraic laws the pipeline primitives must satisfy on arbitrary
inputs, not just fixtures. Example counts are kept small — each
example pays a Spark job — but the generators cover the nasty corners
(empty strings, unicode, negative/huge numbers, duplicate rows).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_to_bigquery_spark.functions.reference_transforms import (
    apply_declared_schema,
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31),
        st.text(max_size=30),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
    max_size=20,
)


@given(data=rows)
@settings(**SETTINGS)
def test_schema_enforcement_idempotent(spark, data):
    # applying the declared schema twice must equal applying it once
    df = spark.createDataFrame(data, "id long, name string, score double")
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("score", T.FloatType()),
        ]
    )
    once = apply_declared_schema(df, schema)
    twice = apply_declared_schema(once, schema)
    assert once.schema == twice.schema
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(data=rows)
@settings(**SETTINGS)
def test_exact_dedup_is_fixpoint_and_union_invariant(spark, data):
    # dedup(x ∪ x) == dedup(x), and dedup is a fixpoint
    df = spark.createDataFrame(data, "id long, name string, score double")
    doubled = df.unionAll(df)
    d1 = sorted(map(tuple, df.dropDuplicates().collect()))
    d2 = sorted(map(tuple, doubled.dropDuplicates().collect()))
    d3 = sorted(map(tuple, df.dropDuplicates().dropDuplicates().collect()))
    assert d1 == d2 == d3


@given(texts=st.lists(st.text(max_size=60), min_size=1, max_size=15))
@settings(**SETTINGS)
def test_normalization_idempotent(spark, texts):
    # the text_normalize transform is a projection onto its own image:
    # normalizing an already-normalized string changes nothing
    def norm(col):
        return F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " "
            )
        )

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        norm(F.col("t")).alias("n1"), norm(norm(F.col("t"))).alias("n2")
    ).collect()
    for r in out:
        assert r["n1"] == r["n2"]


@given(data=rows)
@settings(**SETTINGS)
def test_overwrite_then_append_equals_double(spark, data, tmp_path_factory):
    # S11/S12 law: overwrite(x) then append(x) reads back as x ∪ x
    if not data:
        return
    out = str(tmp_path_factory.mktemp("prop_sink"))
    df = spark.createDataFrame(data, "id long, name string, score double")
    df.write.mode("overwrite").parquet(out)
    df.write.mode("append").parquet(out)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.unionAll(df).collect()))


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    # packing is a partition of the corpus: bin token counts must sum
    # to the corpus total, and every doc lands in exactly one bin.
    from database_to_bigquery_spark.data import load_table
    from database_to_bigquery_spark.operators.training_prep import (
        text_pack_sequences,
    )

    bins = text_pack_sequences(spark, sf_dir)
    got = bins.agg(
        F.sum("bin_tokens").alias("toks"), F.sum("n_docs").alias("docs")
    ).first()
    d = load_table(spark, sf_dir, "documents")
    want_toks = d.agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long")
    ).first()[0]
    assert got["toks"] == want_toks
    assert got["docs"] == d.count()


def test_deterministic_shuffle_is_permutation(spark, sf_dir):
    # (shard, pos) must be a bijection over doc_ids: every doc appears
    # once, and each shard's positions are exactly 1..|shard|.
    from database_to_bigquery_spark.operators.training_prep import (
        q_deterministic_shuffle,
    )

    s = q_deterministic_shuffle(spark, sf_dir)
    n = s.count()
    assert s.select("doc_id").distinct().count() == n
    bad = (
        s.groupBy("shard")
        .agg(F.count("*").alias("c"), F.max("pos").alias("mx"), F.min("pos").alias("mn"))
        .filter((F.col("mx") != F.col("c")) | (F.col("mn") != 1))
    )
    assert bad.isEmpty()
    # and it is actually deterministic: a second evaluation is identical
    s2 = q_deterministic_shuffle(spark, sf_dir)
    assert s.exceptAll(s2).isEmpty() and s2.exceptAll(s).isEmpty()


def test_leakage_safe_split_never_straddles_groups(spark, sf_dir):
    # the whole point of group-hashing: a source maps to exactly one
    # split, and the split ratios are roughly 80/10/10 by group count.
    from database_to_bigquery_spark.operators.training_prep import (
        q_leakage_safe_split,
    )

    s = q_leakage_safe_split(spark, sf_dir)
    straddlers = (
        s.groupBy("source")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
    )
    assert straddlers.isEmpty()
    assert {r["split"] for r in s.select("split").distinct().collect()} <= {
        "train", "val", "test",
    }


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    # the file-skipping guarantee: every Z-bucket's rectangle spans at
    # most 1/16th of EACH key domain (+1 cell of rescale rounding) —
    # a plain sort by x would give y-spans covering the whole domain.
    from database_to_bigquery_spark.data import load_table
    from database_to_bigquery_spark.operators.layout import q_zorder_layout

    zm = q_zorder_layout(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_partkey").alias("xmin"), F.max("l_partkey").alias("xmax"),
        F.min("l_suppkey").alias("ymin"), F.max("l_suppkey").alias("ymax"),
    ).first()
    x_cell = (b["xmax"] - b["xmin"] + 1) / 16 + 1
    y_cell = (b["ymax"] - b["ymin"] + 1) / 16 + 1
    bad = zm.filter(
        ((F.col("x_max") - F.col("x_min")) > x_cell)
        | ((F.col("y_max") - F.col("y_min")) > y_cell)
    )
    assert bad.isEmpty(), [tuple(r) for r in bad.collect()]
    # the zone map partitions the corpus
    assert zm.agg(F.sum("n_rows")).first()[0] == li.count()


def test_lttb_selects_one_point_per_bucket_and_pins_endpoints(spark, sf_dir):
    from database_to_bigquery_spark.data import load_table
    from database_to_bigquery_spark.registry import all_specs

    out = all_specs()["ts_lttb_downsample"].fn(spark, sf_dir).collect()
    buckets = [r.bucket for r in out]
    # one representative per non-empty bucket, buckets strictly ordered
    assert len(buckets) == len(set(buckets))
    assert buckets == sorted(buckets)
    # the series endpoints survive downsampling (LTTB's defining pin)
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("y"))
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .first()
    )
    hours = {r.hour for r in out}
    assert hourly.lo in hours and hourly.hi in hours


def test_stl_components_sum_back_to_series(spark, sf_dir):
    from database_to_bigquery_spark.registry import all_specs

    out = all_specs()["ts_stl_decompose"].fn(spark, sf_dir).collect()
    assert out, "interior of the series must be non-empty"
    for r in out:
        # additive identity y = trend + seasonal + resid holds to the
        # 4-decimal rounding of each component
        assert abs(r.y - (r.trend + r.seasonal + r.resid)) < 5e-4, r


def test_temperature_mixture_is_a_distribution_that_flattens(spark, sf_dir):
    from database_to_bigquery_spark.registry import all_specs

    out = all_specs()["q_temperature_mixture"].fn(spark, sf_dir).collect()
    assert abs(sum(r.p_raw for r in out) - 1.0) < 1e-3
    assert abs(sum(r.p_temp for r in out) - 1.0) < 1e-3
    for r in out:
        # alpha=0.5 pulls every share toward uniform: small shares rise,
        # large shares fall; epochs is exactly that ratio
        if r.p_raw < 1.0 / len(out):
            assert r.p_temp >= r.p_raw or abs(r.p_temp - r.p_raw) < 1e-6
            assert r.epochs >= 1.0 - 1e-6
        if r.p_raw > 1.0 / len(out):
            assert r.p_temp <= r.p_raw or abs(r.p_temp - r.p_raw) < 1e-6
            assert r.epochs <= 1.0 + 1e-6


def test_item_jaccard_bounds(spark, sf_dir):
    from database_to_bigquery_spark.registry import all_specs

    out = all_specs()["graph_item_jaccard"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.item_a < r.item_b  # canonical pair orientation, no dups
        assert 0 < r.n_both <= min(r.n_a, r.n_b)
        assert 0.0 < r.jaccard <= 1.0


def test_survival_curve_is_monotone_nonincreasing(spark, sf_dir):
    from database_to_bigquery_spark.registry import all_specs

    out = sorted(
        all_specs()["q_survival_km"].fn(spark, sf_dir).collect(),
        key=lambda r: r.t_days,
    )
    assert out
    last = 1.0 + 1e-9
    for r in out:
        assert 0.0 <= r.survival <= last + 1e-9, r
        last = r.survival
        assert r.n_events <= r.n_risk


def test_decile_lift_partitions_the_population(spark, sf_dir):
    from database_to_bigquery_spark.data import load_table
    from database_to_bigquery_spark.registry import all_specs

    out = all_specs()["q_decile_lift"].fn(spark, sf_dir).collect()
    assert sorted(r.decile for r in out) == list(range(1, 11))
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_d for r in out) == total
    # rank-arithmetic deciles differ by at most 1 in size
    sizes = [r.n_d for r in out]
    assert max(sizes) - min(sizes) <= 1


def test_paragraph_dedup_keeps_each_distinct_paragraph_once(spark, sf_dir):
    from database_to_bigquery_spark.data import load_table
    from database_to_bigquery_spark.registry import all_specs

    out = all_specs()["text_paragraph_dedup"].fn(spark, sf_dir).collect()
    kept = sum(r.n_kept for r in out)
    d = load_table(spark, sf_dir, "documents")
    n_distinct = (
        d.select(
            F.explode(F.split(F.col("text"), "[.!?] ")).alias("p")
        )
        .filter(F.length("p") > 0)
        .select("p")
        .distinct()
        .count()
    )
    assert kept == n_distinct
    assert all(r.n_kept + r.n_removed == r.n_paras for r in out)


def test_streaks_partition_active_days(spark, sf_dir):
    from database_to_bigquery_spark.data import load_table
    from database_to_bigquery_spark.registry import all_specs

    out = all_specs()["q_activity_streaks"].fn(spark, sf_dir).collect()
    # longest streak is bounded by the user's active-day count, and at
    # least ceil(active_days / n_streaks) (pigeonhole)
    e = load_table(spark, sf_dir, "events")
    active = {
        r.user_id: r.n
        for r in e.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r.user_id for r in out} == set(active)
    for r in out:
        n = active[r.user_id]
        assert 1 <= r.longest_streak <= n
        assert r.longest_streak * r.n_streaks >= n  # pigeonhole


def test_m4_buckets_bound_the_series(spark, sf_dir):
    from database_to_bigquery_spark.data import load_table
    from database_to_bigquery_spark.registry import all_specs

    out = all_specs()["ts_downsample_m4"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.min_y <= r.first_y <= r.max_y
        assert r.min_y <= r.last_y <= r.max_y
        assert r.first_hour <= r.last_hour
    # global extrema survive downsampling exactly
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("y"))
        .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
        .first()
    )
    assert min(r.min_y for r in out) == hourly.lo
    assert max(r.max_y for r in out) == hourly.hi


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=30,
    )
)
def test_degree_oriented_triangle_count_matches_bruteforce(spark, edges):
    """Degree orientation must be COUNT-PRESERVING on arbitrary graphs
    (the round-3 rewrite's claim): for random edge sets, the Spark
    degree-oriented two-join plan equals a driver-side brute-force
    enumeration of all a<b<c triangles. Hubs, isolated edges, empty
    graphs and near-cliques all fall out of the strategy."""
    from itertools import combinations

    from database_to_bigquery_spark.operators.dedup import count_triangles

    und = {(min(a, b), max(a, b)) for a, b in edges}
    nodes = sorted({n for e in und for n in e})
    expected_tris = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    if not und:
        # count_triangles on an empty edge list: 0 edges, 0 triangles
        df = spark.createDataFrame([], "a long, b long")
        row = count_triangles(df).collect()[0]
        assert (row["n_triangles"], row["n_edges"]) == (0, 0)
        return
    df = spark.createDataFrame(sorted(und), "a long, b long")
    row = count_triangles(df).collect()[0]
    assert (row["n_triangles"], row["n_edges"]) == (expected_tris, len(und))


def test_equi_depth_approx_buckets_are_balanced(spark, sf_dir):
    """q_histogram_equi_depth_approx's equi-depth property: with the
    GK sketch at accuracy 10000 (ε=1e-4), every bucket must hold
    n/10 rows to within a small tolerance — the property the exact
    twin's oracle checks by value, asserted here directly so the
    production (approx) path carries its own evidence."""
    from database_to_bigquery_spark.operators.reshape import (
        q_histogram_equi_depth_approx,
    )

    rows = q_histogram_equi_depth_approx(spark, sf_dir).collect()
    assert len(rows) == 10
    n = sum(r["n_orders"] for r in rows)
    for r in rows:
        assert abs(r["n_orders"] - n / 10) <= max(5, 0.02 * n), rows
    # boundaries are ordered and non-overlapping
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["hi"] <= b["lo"], (a, b)


def test_label_propagation_empty_edge_set_converges(spark):
    """Advisor regression (r3): the observe()d changed-count is a SUM,
    which is NULL over an empty label set — an edge-free graph (no
    near-dup pairs anywhere) must return an empty labeling gracefully,
    not crash on int(None)."""
    from database_to_bigquery_spark.operators.dedup import (
        label_propagation_components,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert label_propagation_components(empty).collect() == []


def test_label_propagation_shortcircuit_matches_iterative(spark):
    """r10: an empty contracted label graph short-circuits to the
    round-1 labels without the fixpoint loop. A clique (label graph
    empty — shortcut path) and a path graph (label graph non-empty —
    iterative path) must both produce exact min-label components."""
    from database_to_bigquery_spark.operators.dedup import (
        label_propagation_components,
    )

    def sym(pairs):
        rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        return spark.createDataFrame(rows, "src long, dst long")

    # triangle 1-2-3 plus disjoint edge 10-11: round 1 merges both
    clique = sym([(1, 2), (2, 3), (1, 3), (10, 11)])
    got = {r["node"]: r["label"] for r in label_propagation_components(clique).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    # a 6-node path: round-1 contraction leaves label-graph edges, so
    # the iterative branch must run and still reach the global min
    path = sym([(i, i + 1) for i in range(1, 6)])
    got = {r["node"]: r["label"] for r in label_propagation_components(path).collect()}
    assert got == {i: 1 for i in range(1, 7)}


# --------------------------- tar shard arithmetic (no Spark job) ----

tar_members = st.lists(
    st.binary(min_size=0, max_size=1500),
    min_size=1,
    max_size=12,
)


@given(payloads=tar_members)
@settings(max_examples=60, deadline=None)
def test_tar_arithmetic_matches_tarfile(payloads):
    """The pure-arithmetic layout the shard writer's oracle and the
    mm_tar_member_index offsets rely on must hold for ARBITRARY member
    sizes — including the padding corners 0, 511, 512, 513 bytes that
    hypothesis shrinks toward: header offset = cumulative (512 +
    ceil(size/512)*512), data offset = header + 512, archive size =
    entries + 1024 end-of-archive padded to the 10240 record."""
    import io
    import tarfile

    from database_to_bigquery_spark.operators.training_prep import build_tar

    members = [(f"{i}.bin", b) for i, b in enumerate(payloads)]
    blob = build_tar(members)

    # archive-size arithmetic (the mm_webdataset_write oracle)
    entries = sum(512 + -(-len(b) // 512) * 512 for b in payloads)
    want_size = -(-(entries + 1024) // 10240) * 10240
    assert len(blob) == want_size

    # per-member offset arithmetic (the mm_tar_member_index oracle)
    hdr = 0
    offsets = {}
    for name, b in members:
        offsets[name] = (hdr, hdr + 512)
        hdr += 512 + -(-len(b) // 512) * 512

    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        seen = 0
        for ti in tf:
            want_hdr, want_data = offsets[ti.name]
            assert (ti.offset, ti.offset_data) == (want_hdr, want_data)
            assert blob[want_data : want_data + ti.size] == dict(members)[ti.name]
            seen += 1
    assert seen == len(members)
