"""Two-level vs flat IVF kNN join at the twin tiers (judge r8 task 4):
same-label neighbor purity (the recall proxy the twin's labeled
clustered geometry supports) plus calm-gated walls for both forms, so
the Θ(n^(4/3)) claim gets an exponent AND a recall number at the same
points the flat form's e 1.26 was measured. r10 adds the `auto` form
(`knn_join_ivf_auto_core` — the production entry) so the tier-select
claim is measured on the entry a deployment actually calls, not just
the cores (judge r9 task 2).

Usage: python tools/ivf2_probe.py [x50 x250 ...]   (default x50 x250)
       [--forms flat ivf2 auto]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_to_bigquery_spark.operators.similarity import (  # noqa: E402
    _as_double,
    knn_join_ivf2_core,
    knn_join_ivf_auto_core,
    knn_join_ivf_core,
)
from database_to_bigquery_spark.session import get_spark  # noqa: E402
from tools.calm import timed_calm  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FORMS = {
    "flat": knn_join_ivf_core,
    "ivf2": knn_join_ivf2_core,
    "auto": knn_join_ivf_auto_core,
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    argv = sys.argv[1:]
    forms = ["flat", "ivf2"]
    if "--forms" in argv:
        i = argv.index("--forms")
        forms, argv = argv[i + 1 :], argv[:i]
    scales = argv or ["x50", "x250"]
    spark = get_spark("ivf2-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for scale in scales:
        path = os.path.join(REPO, ".scale_twin", scale, "embeddings.parquet")
        e = (
            spark.read.parquet(path)
            .select("vec_id", "label", _as_double("embedding").alias("v"))
            .persist()
        )
        n = e.count()
        labels = e.select("vec_id", "label")
        vecs = e.select("vec_id", "v")

        def purity(res) -> float:
            return float(
                res.join(labels.withColumnRenamed("label", "ql"), "vec_id")
                .join(
                    labels.select(
                        F.col("vec_id").alias("neighbor_id"),
                        F.col("label").alias("nl"),
                    ),
                    "neighbor_id",
                )
                .agg(F.avg((F.col("ql") == F.col("nl")).cast("double")).alias("p"))
                .collect()[0]["p"]
            )

        out = {"probe": "ivf2_vs_flat", "tier": scale, "vecs": n}
        for name, core in ((f, FORMS[f]) for f in forms):
            out[f"{name}_purity"] = round(purity(core(vecs)), 4)
            wall, flagged = timed_calm(spark, lambda c=core: force(c(vecs)))
            out[f"{name}_wall_sec"] = round(wall, 2)
            if flagged:
                out[f"{name}_wall_flagged"] = True
            print(json.dumps(out), flush=True)
        e.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
