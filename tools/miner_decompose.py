"""Decompose the banded-MinHash miner's wall at a twin scale: which of
the shared stages (shingle build, signature agg, band join, est
attach, exact verification) owns the x50 cost now that the est-attach
diet landed (SCALE.md §14)?

Stages are forced cumulatively from the persisted upstreams, so each
wall is the incremental cost of that stage alone.

Usage: python tools/miner_decompose.py [x50|x10|/path/to/sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_to_bigquery_spark.operators.dedup import (  # noqa: E402
    _MH_K,
    _packed_sig,
    _sig_agreement_packed,
    char_shingles,
    drop_hot_buckets,
    minhash_signatures,
    signature_bands,
)
from database_to_bigquery_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "x50"
    sf_dir = arg if os.path.isdir(arg) else os.path.join(REPO, ".scale_twin", arg)
    spark = get_spark("miner-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    def step(label, df, count=True):
        t0 = time.time()
        n = df.count() if count else df.write.format("noop").mode("overwrite").save()
        print(f"{label}: {time.time()-t0:.1f}s rows={n}", flush=True)
        return df

    shingles = (
        char_shingles(spark, sf_dir)
        .select("doc_id", F.xxhash64("g").alias("g"))
        .sortWithinPartitions("doc_id")
        .persist()
    )
    step("A shingles build+persist", shingles)
    sig = minhash_signatures(shingles).persist()
    step("B signature agg", sig)
    attach = (
        sig.select("doc_id", _packed_sig().alias("sigp"), "n")
        .repartition("doc_id")
        .sortWithinPartitions("doc_id")
        .persist()
    )
    step("C attach relation", attach)
    bands = drop_hot_buckets(signature_bands(sig)).persist()
    step("D bands + hot-bucket cap", bands)
    cand = (
        bands.alias("x")
        .hint("merge")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
        .persist()
    )
    step("E band self-join + distinct", cand)
    sig_est = (
        cand.join(
            attach.select(F.col("doc_id").alias("doc_a"), F.col("sigp").alias("sig_a"))
            .hint("merge"),
            "doc_a",
        )
        .join(
            attach.select(F.col("doc_id").alias("doc_b"), F.col("sigp").alias("sig_b"))
            .hint("merge"),
            "doc_b",
        )
        .withColumn(
            "est_jaccard",
            F.round(_sig_agreement_packed().cast("double") / _MH_K, 4),
        )
        .drop("sig_a", "sig_b")
        .filter(F.col("est_jaccard") >= 0.45)
        .persist()
    )
    step("F est attach + filter", sig_est)
    pair_grams = (
        sig_est.join(
            shingles.select(F.col("doc_id").alias("doc_a"), "g").hint("merge"),
            "doc_a",
        )
        .join(
            shingles.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("g"))
            .hint("merge"),
            ["doc_b", "g"],
        )
        .groupBy("doc_a", "doc_b", "est_jaccard")
        .agg(F.count("*").alias("n_common"))
    )
    step("G exact verification joins", pair_grams)


if __name__ == "__main__":
    main()
