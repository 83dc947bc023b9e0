"""Decompose text_bigram_kn_score's cost at the twins (VERDICT r6
task 5): is the 50k→250k step dominated by the bigram TOKEN stream
(Θ(tokens), inherent for an LM scorer) or by the bigram TYPE
dictionary (the relation a KN-consistent min-count floor could bound)?

Replays the operator's own stages with per-stage walls:
  t_tokens — build + count the (doc, w1, w2) token stream
  t_model  — c12/c1/cont aggregates + the model joins, forced
  t_score  — the final scoring join + per-doc aggregate, forced
and reports type/token counts so the growth of each input is visible.

Usage: python tools/kn_probe.py [x10 x50 ...]   (default: x10 x50)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_to_bigquery_spark.data import load_table_spread, maybe_broadcast  # noqa: E402
from database_to_bigquery_spark.operators.llm_filters import _KN_D  # noqa: E402
from database_to_bigquery_spark.operators.ngram_util import sliding_structs  # noqa: E402
from database_to_bigquery_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    scales = sys.argv[1:] or ["x10", "x50"]
    spark = get_spark("kn-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for scale in scales:
        sf_dir = os.path.join(REPO, ".scale_twin", scale)
        d = load_table_spread(spark, sf_dir, "documents", "doc_id")
        ws = F.split(F.col("text"), " ")
        bg = (
            d.select("doc_id", ws.alias("w"))
            .filter(F.size("w") >= 2)
            .select("doc_id", F.explode(sliding_structs("w", 2)).alias("b"))
            .select("doc_id", F.col("b.w0").alias("w1"), F.col("b.w1").alias("w2"))
            .persist()
        )
        t0 = time.time()
        n_tokens = bg.count()
        t_tokens = time.time() - t0

        c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c")).persist()
        t0 = time.time()
        n_types = c12.count()
        t_types = time.time() - t0
        c1 = c12.groupBy("w1").agg(
            F.sum("c").alias("n"), F.count("*").alias("types_fw")
        )
        cont = c12.groupBy("w2").agg(F.count("*").alias("types_bw"))
        npairs = c12.agg(F.count("*").alias("n_types"))
        pkn = (
            F.greatest(F.col("c") - _KN_D, F.lit(0.0))
            + _KN_D
            * F.col("types_fw")
            * (F.col("types_bw").cast("double") / F.col("n_types"))
        ) / F.col("n")
        p = (
            c12.join(maybe_broadcast(c1), "w1")
            .join(maybe_broadcast(cont), "w2")
            .join(F.broadcast(npairs))
            .select("w1", "w2", pkn.alias("pkn"))
            .persist()
        )
        t0 = time.time()
        p.count()
        t_model = time.time() - t0

        score = (
            bg.join(maybe_broadcast(p), ["w1", "w2"])
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_bigrams"),
                F.round(F.avg(F.log("pkn")), 4).alias("avg_logp_kn"),
            )
        )
        t0 = time.time()
        force(score)
        t_score = time.time() - t0
        print(
            f"{scale}: tokens={n_tokens:,} ({t_tokens:.1f}s build) "
            f"types={n_types:,} ({t_types:.1f}s agg) "
            f"model-joins={t_model:.1f}s scoring-join={t_score:.1f}s",
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
