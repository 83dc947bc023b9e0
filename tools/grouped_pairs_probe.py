"""Twin-measure the r10 grouped single-pass pair rewrites against the
pre-r10 distinct+self-join shapes (VERDICT r10 task 3): the three
queries — graph_item_jaccard, q_cooccurrence_pairs,
q_basket_affinity_lift — traded a per-group collect_list/collect_set
build for 3-4x fewer scans/exchanges, a trade that was argued at scale
but only measured at the fixture (where it costs ~0.1-0.2 s). This
probe fits the trade over two decades (x50/x250 row-count twins of the
events/lineitem fixtures) plus a SKEWED-KEY variant per tier (one
whale user engaging every item / one whale basket holding 5000 parts —
the natural skew point of a grouped shape, guide §2.5: the self-join's
C(f,2) blowup and the array's are the same size, but the array
concentrates it in ONE task's memory rather than a joinable shuffle).

Both shapes run from THIS file: `new` is the current operator code
(registry fn), `old` is the pre-r10 implementation copied verbatim
from commit 04fac51. Shuffle bytes are read from the Spark event log
(deterministic across runs); task CPU and wall carry the VM's +-40%
phase noise, so compare them only within one calm session.

Usage:
  python tools/grouped_pairs_probe.py gen [x50|x250|x50_whale|x250_whale ...]
  python tools/grouped_pairs_probe.py run <query> <old|new> <tier>
  python tools/grouped_pairs_probe.py verify <query> <tier>   # old == new rows
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_BASE = os.path.join(REPO, ".scale_twin", "pairs")
LOG_DIR = "/tmp/spark-events-pairs-probe"

# (n_events, n_users, n_item_types) / (n_lineitem, n_orders, n_parts)
TIERS = {
    "x50": dict(ev=(5_000_000, 75_000, 250), li=(30_000_000, 7_400_000, 1_000_000)),
    "x250": dict(ev=(25_000_000, 375_000, 1_000), li=(150_000_000, 37_000_000, 5_000_000)),
}
WHALE_PARTS = 5_000  # one order holding this many distinct parts
SEED = 20260818


def _gen_tier(tier: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tier.replace("_whale", "")
    whale = tier.endswith("_whale")
    cfg = TIERS[base]
    out = os.path.join(OUT_BASE, tier)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_ev, n_users, n_types = cfg["ev"]
    # Zipf-weighted item popularity (real co-engagement data), users
    # uniform. ts is a dummy us-timestamp column so load_table's
    # nanos-as-long branch stays dormant.
    w = 1.0 / np.arange(1, n_types + 1) ** 1.1
    w /= w.sum()
    users = rng.integers(0, n_users, n_ev, dtype=np.int64)
    items = rng.choice(n_types, n_ev, p=w).astype(np.int64)
    if whale:
        # one whale user engaging EVERY item type: fanout f = n_types,
        # C(f,2) pairs concentrated in a single group
        users = np.concatenate([users, np.full(n_types, -1, dtype=np.int64)])
        items = np.concatenate([items, np.arange(n_types, dtype=np.int64)])
    ts = pa.array(
        np.full(len(users), 1_700_000_000_000_000, dtype=np.int64),
        type=pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "user_id": users,
                "event_type": pa.compute.binary_join_element_wise(
                    "t", pa.compute.cast(pa.array(items), pa.string()), ""
                ),
                "ts": ts,
            }
        ),
        os.path.join(out, "events.parquet"),
    )

    n_li, n_orders, n_parts = cfg["li"]
    orders = rng.integers(0, n_orders, n_li, dtype=np.int64)
    parts = rng.integers(0, n_parts, n_li, dtype=np.int64)
    # supplier/quantity columns so the lineitem-derived GRAPH operators
    # (graph_pagerank_2iter et al. via _edges) can run on the twin too
    supps = rng.integers(0, max(1, n_parts // 10), n_li, dtype=np.int64)
    qty = rng.integers(1, 51, n_li, dtype=np.int64).astype(np.float64)
    if whale:
        orders = np.concatenate(
            [orders, np.full(WHALE_PARTS, -1, dtype=np.int64)]
        )
        parts = np.concatenate([parts, np.arange(WHALE_PARTS, dtype=np.int64)])
        supps = np.concatenate([supps, np.zeros(WHALE_PARTS, dtype=np.int64)])
        qty = np.concatenate([qty, np.full(WHALE_PARTS, 25.0)])
    pq.write_table(
        pa.table(
            {
                "l_orderkey": orders,
                "l_partkey": parts,
                "l_suppkey": supps,
                "l_quantity": qty,
            }
        ),
        os.path.join(out, "lineitem.parquet"),
    )
    print(f"wrote {out}: events={len(users):,} lineitem={len(orders):,}")


# ------------------------- pre-r10 shapes (verbatim from 04fac51) ----


def _old_graph_item_jaccard(spark, sf_dir):
    from pyspark.sql import functions as F

    from database_to_bigquery_spark.data import load_table

    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.select(F.col("user_id"), F.col("event_type").alias("item_a"))
    b = ut.select(F.col("user_id").alias("uid_b"), F.col("event_type").alias("item_b"))
    inter = (
        a.join(b, (a.user_id == b.uid_b) & (F.col("item_a") < F.col("item_b")))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    sizes = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    sa = sizes.select(F.col("event_type").alias("item_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("item_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


def _old_q_cooccurrence_pairs(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_to_bigquery_spark.data import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.orderBy(F.col("n_orders").desc(), "part_a", "part_b")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "part_a",
            "part_b",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def _old_q_basket_affinity_lift(spark, sf_dir):
    from pyspark.sql import functions as F

    from database_to_bigquery_spark.data import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part"))
        .distinct()
        .persist()
    )
    n = li.agg(F.count_distinct("ok").alias("n_baskets"))
    supp = li.groupBy("part").agg(F.count("*").alias("s"))
    a = li.select("ok", F.col("part").alias("part_a"))
    b = li.select("ok", F.col("part").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    sa = supp.select(F.col("part").alias("part_a"), F.col("s").alias("s_a"))
    sb = supp.select(F.col("part").alias("part_b"), F.col("s").alias("s_b"))
    scored = (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .join(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("s_a").cast("long").alias("s_a"),
            F.col("s_b").cast("long").alias("s_b"),
            F.round(F.col("n_both").cast("double") / F.col("s_a"), 4).alias(
                "confidence"
            ),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_baskets")
                / (F.col("s_a") * F.col("s_b")),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "part_a", "part_b").limit(15)


def _old_graph_pagerank_2iter(spark, sf_dir):
    from pyspark.sql import functions as F

    from database_to_bigquery_spark.operators.graph import _DAMP, _edges

    edges = _edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    n = deg.agg(F.count("*").alias("n"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(2):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("w"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("w").alias("mass"))
            .crossJoin(F.broadcast(n))
            .select(
                F.col("dst").alias("node"),
                (F.lit(1 - _DAMP) / F.col("n") + F.lit(_DAMP) * F.col("mass")).alias(
                    "pr"
                ),
            )
        )
    return ranks.select("node", F.round("pr", 7).alias("pr"))


def _old_graph_label_propagation_2iter(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_to_bigquery_spark.operators.graph import _edges

    e0 = _edges(spark, sf_dir)
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(2):
        votes = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), "label")
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").cast("long").alias("n_members")
    )


OLD = {
    "graph_item_jaccard": _old_graph_item_jaccard,
    "q_cooccurrence_pairs": _old_q_cooccurrence_pairs,
    "q_basket_affinity_lift": _old_q_basket_affinity_lift,
    "graph_pagerank_2iter": _old_graph_pagerank_2iter,
    "graph_label_propagation_2iter": _old_graph_label_propagation_2iter,
}


def _fn(query: str, shape: str):
    if shape == "old":
        return OLD[query]
    from database_to_bigquery_spark.registry import all_specs

    return all_specs()[query].fn


def _run(query: str, shape: str, tier: str) -> None:
    from database_to_bigquery_spark.session import get_spark

    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)
    spark = get_spark(
        f"pairs-probe-{query}-{shape}-{tier}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOG_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sf_dir = os.path.join(OUT_BASE, tier)
    fn = _fn(query, shape)
    spark.sparkContext.setJobDescription(f"{query}:{shape}:{tier}")
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    app = spark.sparkContext.applicationId
    spark.stop()

    cpu = run_t = sh_r = sh_w = in_b = spill = 0
    peak_mem = 0
    path = os.path.join(LOG_DIR, app)
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
        if os.path.isdir(path)
        else [path]
    )
    for f in files:
        for line in open(f):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            m = ev.get("Task Metrics") or {}
            cpu += m.get("Executor CPU Time", 0)
            run_t += m.get("Executor Run Time", 0)
            sh_r += (m.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0
            ) + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            sh_w += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
            in_b += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
            spill += m.get("Disk Bytes Spilled", 0)
            peak_mem = max(peak_mem, m.get("Peak Execution Memory", 0))
    print(
        json.dumps(
            {
                "query": query,
                "shape": shape,
                "tier": tier,
                "wall_s": round(wall, 2),
                "task_cpu_s": round(cpu / 1e9, 1),
                "task_run_s": round(run_t / 1e3, 1),
                "shuffle_write_mb": round(sh_w / 1e6, 1),
                "shuffle_read_mb": round(sh_r / 1e6, 1),
                "input_mb": round(in_b / 1e6, 1),
                "spill_mb": round(spill / 1e6, 1),
                "peak_task_mem_mb": round(peak_mem / 1e6, 1),
            }
        )
    )


def _verify(query: str, tier: str) -> None:
    """old and new must return the identical row multiset on the twin."""
    from database_to_bigquery_spark.session import get_spark

    spark = get_spark(f"pairs-verify-{query}-{tier}")
    sf_dir = os.path.join(OUT_BASE, tier)
    old = _fn(query, "old")(spark, sf_dir)
    new = _fn(query, "new")(spark, sf_dir)
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    n = new.count()
    print(f"{query} {tier}: rows={n} symmetric_diff={diff}")
    spark.stop()
    if diff:
        sys.exit(1)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    cmd = sys.argv[1]
    if cmd == "gen":
        tiers = sys.argv[2:] or ["x50", "x50_whale", "x250", "x250_whale"]
        for t in tiers:
            _gen_tier(t)
        return 0
    if cmd == "run":
        _run(sys.argv[2], sys.argv[3], sys.argv[4])
        return 0
    if cmd == "verify":
        _verify(sys.argv[2], sys.argv[3])
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
