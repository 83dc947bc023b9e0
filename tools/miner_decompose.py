"""Decompose the banded-MinHash miner's wall at a twin scale: which of
the shared stages (shingle build, signature agg, band join with
inline est filter, exact verification) owns the twin-scale cost now
that the est filter runs inside the bucket join (SCALE.md §15)?

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

    # mirrors minhash_verified_pairs: char_shingles emits gids at the
    # source (shingles_of), and the cache is part-sorted on (doc_id, g)
    # so BOTH verification attaches below reuse the layout (r8)
    shingles = (
        char_shingles(spark, sf_dir)
        .sortWithinPartitions("doc_id", "g")
        .persist()
    )
    step("A shingles build+persist", shingles)
    sig = minhash_signatures(shingles).persist()
    step("B signature agg", sig)
    sizes = (
        sig.select("doc_id", "n")
        .repartition("doc_id")
        .sortWithinPartitions("doc_id")
        .persist()
    )
    step("C sizes relation", sizes)
    bands = drop_hot_buckets(
        signature_bands(sig.withColumn("sigp", _packed_sig()), carry=("sigp",))
    ).persist()
    step("D bands(+sigp) + hot-bucket cap", bands)
    # r8 shape: est estimated + filtered INSIDE the bucket join output
    # stage, before any exchange (the candidate background never
    # shuffles); distinct only on the survivors
    sig_est = (
        bands.alias("x")
        .hint("merge")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.round(
                _sig_agreement_packed("x.sigp", "y.sigp").cast("double") / _MH_K,
                4,
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= 0.45)
        .distinct()
        .persist()
    )
    step("E band join + inline est filter + distinct", sig_est)
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
