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

Usage: python tools/incremental_steady_probe.py [--batch-rows 2000]
       [--reps 3] [--tiers x10 x50 x250]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-rows", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiers", nargs="+", default=["x10", "x50", "x250"])
    args = ap.parse_args()

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

        # ---- backfill (one-time in production): standing layout + labels
        t0 = time.time()
        c_sh_raw = shingles_of(corpus_docs)
        c_sh, c_sig, c_bands = probe_layout(
            c_sh_raw, minhash_signatures(c_sh_raw)
        )
        force(c_sh)
        force(c_sig)
        force(c_bands)
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

        # ---- steady state: the per-batch cost, standing state prebuilt
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            i_sh = shingles_of(batch_docs)
            i_sig = minhash_signatures(i_sh).persist()
            inc_vs_corpus = cross_minhash_pairs(
                i_sh, c_sh, corpus_sig=c_sig, batch_sig=i_sig,
                corpus_bands=c_bands, prune_corpus_to_batch=True,
            )
            inc_internal = cross_minhash_pairs(
                i_sh, i_sh, corpus_sig=i_sig, batch_sig=i_sig
            ).filter(F.col("batch_id") < F.col("corpus_id"))
            new_edges = (
                inc_vs_corpus.unionByName(inc_internal)
                .select(F.col("batch_id").alias("a"), F.col("corpus_id").alias("b"))
                .localCheckpoint(eager=True)
            )
            force(incremental_label_update(new_edges, standing))
            walls.append(time.time() - t0)
            i_sig.unpersist()
        wall = statistics.median(walls)
        results.append(
            {
                "tier": tier,
                "corpus_rows": n_corpus,
                "batch_rows": args.batch_rows,
                "backfill_sec": round(backfill, 2),
                "batch_sec": round(wall, 2),
                "batch_walls": [round(w, 2) for w in walls],
            }
        )
        print(
            f"{tier}: corpus={n_corpus:,} backfill={backfill:.1f}s "
            f"batch({args.batch_rows})={wall:.2f}s {walls}"
        )
        for rel in (c_sh, c_sig, c_bands):
            rel.unpersist()
        spark.catalog.clearCache()

    if len(results) >= 2:
        (r1, r2) = results[0], results[-1]
        exp = math.log(r2["batch_sec"] / r1["batch_sec"]) / math.log(
            r2["corpus_rows"] / r1["corpus_rows"]
        )
    else:
        exp = float("nan")
    print(
        json.dumps(
            {"probe": "incremental_steady_state", "results": results,
             "batch_wall_exponent_in_corpus_rows": round(exp, 3)}
        )
    )


if __name__ == "__main__":
    main()
