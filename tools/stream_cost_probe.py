"""Per-batch cost probe for the streaming fuzzy-dedup job (VERDICT r4
task 7): run N micro-batches of CONSTANT size while the admissions
store GROWS by ~one batch per trigger, and show that per-batch wall
stays ~flat — i.e. the probe cost is O(batch), not O(admissions).

Batches are mostly-novel documents drawn from the x10 scale twin
(tools/gen_scale_twin.py), so nearly every doc is admitted and the
standing admissions corpus grows linearly while batch size is pinned.
Per-batch wall comes from Spark's own streaming progress
(durationMs.triggerExecution). The compaction batches (every
_ADMISSIONS_COMPACT_EVERY-th) are reported separately: they fold the
delta into a fresh part-sorted base from one store scan — the
LSM-style amortized maintenance, expected to cost more than a plain
probe batch and to be the ONLY thing that grows with total
admissions.

Output: one JSON line with per-batch walls, the steady-state medians
of the first vs second half (flatness ratio), and the compaction
walls. A ratio ~1 with admissions 6x larger in the second half is
the O(batch) evidence recorded in SCALE.md §7.

Usage: python tools/stream_cost_probe.py [--batches 12] [--rows 400]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_to_bigquery_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TWIN_DOCS = os.path.join(REPO, ".scale_twin", "x10", "documents.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--rows", type=int, default=400)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from database_to_bigquery_spark.streaming import jobs
    from database_to_bigquery_spark.streaming.jobs import run_fuzzy_dedup_stream

    spark = get_spark()
    docs = spark.read.parquet(TWIN_DOCS)
    corpus = docs.filter(F.col("doc_id") < 2000).select("doc_id", "text")

    work = tempfile.mkdtemp(prefix="stream_cost_probe_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    # one parquet file per micro-batch, mtime-ordered so
    # maxFilesPerTrigger=1 replays them in sequence
    t0 = time.time() - 10 * args.batches
    for b in range(args.batches):
        lo = 10_000 + b * args.rows
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + args.rows)
        ).select("doc_id", "text")
        tmp = os.path.join(work, f"b{b}")
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = os.path.join(src, f"{b:04d}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + 10 * b,) * 2)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    handle = run_fuzzy_dedup_stream(
        stream,
        corpus,
        out_dir=os.path.join(work, "out"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        admissions_dir=os.path.join(work, "admissions"),
    )
    handle.awaitTermination()

    def as_dict(p):  # pyspark returns dicts or StreamingQueryProgress
        if isinstance(p, dict):
            return p
        j = p.json
        return json.loads(j if isinstance(j, str) else j())

    prog = sorted(
        (as_dict(p) for p in handle.query.recentProgress),
        key=lambda p: p["batchId"],
    )
    walls = {p["batchId"]: p["durationMs"]["triggerExecution"] / 1e3 for p in prog}
    every = jobs._ADMISSIONS_COMPACT_EVERY
    compact = {b: w for b, w in walls.items() if (b + 1) % every == 0}
    # batch 0 excluded everywhere: it pays corpus-cache materialization
    steady = {b: w for b, w in walls.items() if b not in compact and b > 0}
    ks = sorted(steady)
    half = len(ks) // 2
    first = statistics.median(steady[b] for b in ks[:half])
    second = statistics.median(steady[b] for b in ks[half:])
    print(
        json.dumps(
            {
                "rows_per_batch": args.rows,
                "n_batches": args.batches,
                "compact_every": every,
                "steady_wall_s": {str(b): round(steady[b], 2) for b in ks},
                "compact_wall_s": {str(b): round(w, 2) for b, w in compact.items()},
                "first_half_median_s": round(first, 2),
                "second_half_median_s": round(second, 2),
                "flatness_ratio": round(second / first, 3),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
