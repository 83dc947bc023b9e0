"""Steady-state per-batch cost probe for incremental cluster
maintenance (VERDICT r7 task 7): `dedup_incremental_clusters`' twin-
ladder wall (51.6 s at x50) is dominated by the one-time standing-state
backfill, so the ladder says nothing about the cost a production
pipeline actually pays per arriving batch. This probe separates the
two: build the standing state ONCE per corpus tier (the backfill — a
maintained table in production), then time ONLY the incremental step —
shingle + sign the batch, mine batch-vs-corpus and batch-internal
edges against the part-sorted standing layout (`probe_layout`), and
run the label-graph remap (`incremental_label_update`) — for a FIXED
2000-doc batch while the corpus grows 50k → 250k → 1.25M docs.

The docstring claim under test: the remap is O(new edges) and the
mining is O(batch × bands + collisions), so per-batch wall should be
~flat (exponent ≪ 1 in corpus rows) while the backfill grows like the
corpus miner. Output: one JSON line + SCALE.md-ready rows.

r10 (judge r9 task 4): per-batch BYTES-READ is measured alongside wall
(executor input-bytes counters — cached-block reads count as input, so
the cached path and the store path are comparable), and ``--mode
store`` swaps the part-sorted cache layout for the Bloom-indexed
bucketed StandingStore (streaming/standing_store.py), whose per-batch
bytes are O(batch + collisions) instead of O(corpus). ``--mode both``
runs the two head-to-head per tier.

Usage: python tools/incremental_steady_probe.py [--batch-rows 2000]
       [--reps 3] [--tiers x10 x50 x250] [--mode cached|store|both]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_to_bigquery_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def input_bytes(spark) -> int:
    """Cumulative executor input bytes (file + cached-block reads) —
    deltas around a step give its bytes-read."""
    execs = spark.sparkContext._jsc.sc().statusStore().executorList(False)
    return sum(execs.apply(i).totalInputBytes() for i in range(execs.size()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-rows", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiers", nargs="+", default=["x10", "x50", "x250"])
    ap.add_argument("--mode", choices=["cached", "store", "both"], default="cached")
    args = ap.parse_args()
    modes = ["cached", "store"] if args.mode == "both" else [args.mode]

    from pyspark.sql import functions as F

    from database_to_bigquery_spark.operators.dedup import (
        cross_minhash_pairs,
        incremental_label_update,
        label_propagation_components,
        minhash_signatures,
        shingles_of,
        _symmetrized_edges,
    )
    from database_to_bigquery_spark.streaming.jobs import probe_layout

    spark = get_spark("incremental-steady-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for tier in args.tiers:
        path = os.path.join(REPO, ".scale_twin", tier, "documents.parquet")
        if not os.path.isdir(path) and not os.path.exists(path):
            print(f"skip {tier}: {path} missing")
            continue
        docs = spark.read.parquet(path)
        is_batch = F.col("doc_id") % 10 == 0
        corpus_docs = docs.filter(~is_batch).select("doc_id", "text")
        batch_docs = (
            docs.filter(is_batch)
            .select("doc_id", "text")
            .orderBy("doc_id")
            .limit(args.batch_rows)
            # limit collapses to one partition; spread the batch before
            # its 60× shingle expansion (constant-factor fairness — the
            # exponent is unaffected)
            .repartition(32, "doc_id")
        )
        n_corpus = corpus_docs.count()

        for mode in modes:
            # ---- backfill (one-time in production): standing state
            t0 = time.time()
            c_sh_raw = shingles_of(corpus_docs)
            store = None
            if mode == "cached":
                c_sh, c_sig, c_bands = probe_layout(
                    c_sh_raw, minhash_signatures(c_sh_raw)
                )
                force(c_sh)
                force(c_sig)
                force(c_bands)
            else:
                from database_to_bigquery_spark.streaming.standing_store import (
                    StandingStore,
                )

                store_dir = os.path.join(
                    REPO, ".scale_twin", tier, "standing_store"
                )
                store = StandingStore.build(
                    c_sh_raw.repartition(
                        spark.sparkContext.defaultParallelism, "doc_id"
                    ),
                    store_dir,
                )
                # the cached layout is still needed for the corpus
                # backfill miner below; built OUTSIDE the steady loop
                c_sh, c_sig, c_bands = probe_layout(
                    c_sh_raw, minhash_signatures(c_sh_raw)
                )
            corpus_pairs = cross_minhash_pairs(
                c_sh, c_sh, corpus_sig=c_sig, batch_sig=c_sig, corpus_bands=c_bands
            ).filter(F.col("batch_id") < F.col("corpus_id"))
            standing = label_propagation_components(
                _symmetrized_edges(
                    corpus_pairs.select(
                        F.col("batch_id").alias("doc_a"),
                        F.col("corpus_id").alias("doc_b"),
                    )
                )
            ).localCheckpoint(eager=True)
            backfill = time.time() - t0
            if mode == "store":
                # steady state must not read the corpus caches — the
                # store IS the standing state; drop them so bytes-read
                # measures only the store path
                for rel in (c_sh, c_sig, c_bands):
                    rel.unpersist()
                spark.catalog.clearCache()

            # ---- steady state: the per-batch cost, standing prebuilt
            walls, byte_counts = [], []
            for _ in range(args.reps):
                cleanup = []
                b0 = input_bytes(spark)
                t0 = time.time()
                i_sh = shingles_of(batch_docs)
                i_sig = minhash_signatures(i_sh).persist()
                cleanup.append(i_sig)
                if mode == "cached":
                    inc_vs_corpus = cross_minhash_pairs(
                        i_sh, c_sh, corpus_sig=c_sig, batch_sig=i_sig,
                        corpus_bands=c_bands, prune_corpus_to_batch=True,
                        cleanup=cleanup,
                    )
                else:
                    inc_vs_corpus = store.probe(
                        i_sh, batch_sig=i_sig, cleanup=cleanup
                    )
                inc_internal = cross_minhash_pairs(
                    i_sh, i_sh, corpus_sig=i_sig, batch_sig=i_sig
                ).filter(F.col("batch_id") < F.col("corpus_id"))
                new_edges = (
                    inc_vs_corpus.unionByName(inc_internal)
                    .select(
                        F.col("batch_id").alias("a"),
                        F.col("corpus_id").alias("b"),
                    )
                    .localCheckpoint(eager=True)
                )
                force(incremental_label_update(new_edges, standing))
                walls.append(time.time() - t0)
                byte_counts.append(input_bytes(spark) - b0)
                for df in cleanup:
                    df.unpersist()
            wall = statistics.median(walls)
            mbytes = statistics.median(byte_counts) / 1e6
            results.append(
                {
                    "tier": tier,
                    "mode": mode,
                    "corpus_rows": n_corpus,
                    "batch_rows": args.batch_rows,
                    "backfill_sec": round(backfill, 2),
                    "batch_sec": round(wall, 2),
                    "batch_walls": [round(w, 2) for w in walls],
                    "batch_input_mb": round(mbytes, 1),
                    "batch_input_mb_all": [round(b / 1e6, 1) for b in byte_counts],
                }
            )
            print(
                f"{tier}/{mode}: corpus={n_corpus:,} backfill={backfill:.1f}s "
                f"batch({args.batch_rows})={wall:.2f}s input={mbytes:.1f}MB"
            )
            for rel in (c_sh, c_sig, c_bands):
                rel.unpersist()
            spark.catalog.clearCache()

    out = {"probe": "incremental_steady_state", "results": results}
    for mode in modes:
        rows = [r for r in results if r["mode"] == mode]
        if len(rows) >= 2:
            r1, r2 = rows[0], rows[-1]
            ratio = math.log(r2["corpus_rows"] / r1["corpus_rows"])
            out[f"batch_wall_exponent_{mode}"] = round(
                math.log(r2["batch_sec"] / r1["batch_sec"]) / ratio, 3
            )
            out[f"batch_bytes_exponent_{mode}"] = round(
                math.log(
                    max(r2["batch_input_mb"], 0.1) / max(r1["batch_input_mb"], 0.1)
                )
                / ratio,
                3,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
