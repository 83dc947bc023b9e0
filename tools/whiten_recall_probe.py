"""Measure the recall whitening buys the IVF kNN join on anisotropic
embeddings (VERDICT r6 task 7) — the production reason
`sim_knn_join_ivf_whitened` exists.

Runs `knn_join_ivf_core` on `.scale_twin/*/embeddings_aniso.parquet`
(clustered geometry x a 4-dim 60x "rogue dimension" distortion — the
anisotropy shape trained encoders emit) raw and whitened, and reports
same-label neighbor purity for both. Paste the numbers into SCALE.md.

Usage: python tools/whiten_recall_probe.py [x10|x50 ...]  (default x10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_to_bigquery_spark.operators.similarity import (  # noqa: E402
    _as_double,
    knn_join_ivf_core,
    whiten_corpus,
)
from database_to_bigquery_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    scales = sys.argv[1:] or ["x10"]
    spark = get_spark("whiten-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for scale in scales:
        path = os.path.join(REPO, ".scale_twin", scale, "embeddings_aniso.parquet")
        e = spark.read.parquet(path).select(
            "vec_id", "label", _as_double("embedding").alias("v")
        ).persist()
        labels = e.select("vec_id", "label")
        vecs = e.select("vec_id", "v")

        def purity(res) -> float:
            scored = (
                res.join(labels.withColumnRenamed("label", "ql"), "vec_id")
                .join(
                    labels.select(
                        F.col("vec_id").alias("neighbor_id"),
                        F.col("label").alias("nl"),
                    ),
                    "neighbor_id",
                )
                .agg(
                    F.avg((F.col("ql") == F.col("nl")).cast("double")).alias("p")
                )
                .collect()
            )
            return float(scored[0]["p"])

        t0 = time.time()
        raw = purity(knn_join_ivf_core(vecs))
        t1 = time.time()
        wht = purity(knn_join_ivf_core(whiten_corpus(vecs)))
        t2 = time.time()
        spark.catalog.clearCache()
        print(
            f"{scale}: same-label purity raw={raw:.4f} ({t1-t0:.1f}s) "
            f"whitened={wht:.4f} ({t2-t1:.1f}s)"
        )


if __name__ == "__main__":
    main()
