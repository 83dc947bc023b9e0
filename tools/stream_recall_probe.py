"""End-to-end ground-truth recall of the STREAMING fuzzy-dedup path
(judge r8 task 7): the true_pairs.parquet sidecar already validates
the batch miner (tools/miner_recall_probe.py); this probe threads the
same known truth through `run_fuzzy_dedup_stream`'s admissions flow —
the growing-corpus production shape, where batch N+1 dedups against
the static corpus PLUS whatever batches ≤ N admitted.

Setup: the twin's documents stream in doc_id order (the generator's
duplication events always point at EARLIER docs, so a dup arrives
after its source): the first `--corpus-frac` of docs form the standing
corpus, the rest arrive as `--files` micro-batches (FileStreamSource,
mtime-forced order, maxFilesPerTrigger=1).

Metric: DOC-LEVEL detection recall — of the streamed docs that have at
least one true-J ≥ 0.6 partner among docs that arrived before them
(sidecar events closed over exact cliques), what fraction did the
stream flag (emit ≥ 1 match row for)? Doc-level because admission
dedup THINS the standing set: if b's nearest partner was itself
dropped at admission, b can legitimately only match an earlier family
member — which the closure covers for exact chains and which near
chains may place under the 0.6 bar (counted and reported, not hidden).

Usage: python tools/stream_recall_probe.py [x10|x50] [--files 10]
       [--corpus-frac 0.6]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_to_bigquery_spark.operators.dedup import shingles_of  # noqa: E402
from database_to_bigquery_spark.session import get_spark  # noqa: E402
from database_to_bigquery_spark.streaming.jobs import (  # noqa: E402
    run_fuzzy_dedup_stream,
)
from tools.miner_recall_probe import close_over_exact  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tier", nargs="?", default="x10")
    ap.add_argument("--files", type=int, default=10)
    ap.add_argument("--corpus-frac", type=float, default=0.6)
    args = ap.parse_args()

    d = (
        args.tier
        if os.path.isdir(args.tier)
        else os.path.join(REPO, ".scale_twin", args.tier)
    )
    spark = get_spark("stream-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    n_docs = docs.count()
    cut = int(n_docs * args.corpus_frac)
    # spread before the 60× shingle expansion (the char_shingles rule)
    corpus_docs = (
        docs.filter(F.col("doc_id") < cut)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", "text")
    )
    stream_docs = docs.filter(F.col("doc_id") >= cut).select("doc_id", "text")

    # ---- truth: closed sidecar pairs at true J >= 0.6 whose LATER doc
    # is in the streamed range (the earlier partner arrived first by
    # construction — doc_id order IS arrival order here)
    raw_events = [
        (r["a"], r["b"], r["kind"])
        for r in spark.read.parquet(os.path.join(d, "true_pairs.parquet")).collect()
    ]
    pairs = spark.createDataFrame(
        close_over_exact(raw_events), "a long, b long, kind string"
    )
    involved = (
        pairs.select(F.col("a").alias("doc_id"))
        .unionByName(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sh_t = shingles_of(
        docs.join(involved, "doc_id", "left_semi").select("doc_id", "text")
    ).persist()
    sizes = sh_t.groupBy("doc_id").count().withColumnRenamed("count", "n")
    inter = (
        pairs.join(sh_t.select(F.col("doc_id").alias("a"), "g"), "a")
        .join(sh_t.select(F.col("doc_id").alias("b"), F.col("g").alias("g")), ["b", "g"])
        .groupBy("a", "b", "kind")
        .agg(F.count("*").alias("c"))
    )
    truth = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .withColumn("j", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .filter(F.col("j") >= 0.6)
        .select(
            F.least("a", "b").alias("early"),
            F.greatest("a", "b").alias("late"),
            "kind",
        )
        .localCheckpoint(eager=True)
    )
    # streamed docs owing a detection: late side in the streamed range
    dup_docs = {
        r["late"]
        for r in truth.filter(F.col("late") >= cut).select("late").distinct().collect()
    }
    sh_t.unpersist()
    spark.catalog.clearCache()

    # ---- stream the tail as ordered micro-batch files
    work = tempfile.mkdtemp(prefix="stream_recall_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    span = (n_docs - cut + args.files - 1) // args.files
    for i in range(args.files):
        lo, hi = cut + i * span, cut + (i + 1) * span
        part_dir = os.path.join(work, f"part{i}")
        (
            stream_docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        for p in os.listdir(part_dir):
            if p.startswith("part-") and p.endswith(".parquet"):
                dst = os.path.join(src, f"{i:04d}.parquet")
                shutil.copy(os.path.join(part_dir, p), dst)
                os.utime(dst, (time.time() - 10_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = os.path.join(work, "matches")
    t0 = time.time()
    q = run_fuzzy_dedup_stream(
        stream,
        corpus_docs,
        out,
        os.path.join(work, "ckpt"),
        admissions_dir=os.path.join(work, "admissions"),
    )
    q.awaitTermination()
    wall = time.time() - t0

    flagged = {
        r["batch_id"]
        for r in spark.read.parquet(out).select("batch_id").distinct().collect()
    }
    caught = dup_docs & flagged
    false_flags = flagged - dup_docs  # flagged without a recorded event
    print(
        json.dumps(
            {
                "probe": "stream_fuzzy_dedup_recall_vs_ground_truth",
                "tier": args.tier,
                "corpus_docs": cut,
                "streamed_docs": n_docs - cut,
                "micro_batches": args.files,
                "stream_wall_sec": round(wall, 1),
                "dup_docs_owing_detection": len(dup_docs),
                "detected": len(caught),
                "doc_detection_recall": round(
                    len(caught) / max(len(dup_docs), 1), 6
                ),
                "flagged_without_recorded_event": len(false_flags),
                "truth_scope": (
                    "sidecar events closed over exact cliques; near-chain "
                    "pairs not derivable from events are out of scope"
                ),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
