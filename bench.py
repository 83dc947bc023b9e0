"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The line also carries a "production" block: the same totals restricted
to the production profile (registry.production_specs() — every
scale_twin-annotated exact form excluded), so the headline number can
never silently lean on the intentionally scale-unsafe oracle twins.
``--production`` times ONLY that profile (the 100 TB-shaped subset).

Measurement hygiene (the VM shows ±40% run-to-run variance):
- each query is forced with a noop-format write (full distributed
  execution, no driver collect — the honest cost)
- one warmup pass absorbs JVM/codegen startup and Python-worker forks
- the timed section runs $SPARK_GRAFT_BENCH_RUNS (default 3) full
  round-robin passes over the query set — round-robin, not
  back-to-back per query, so slow VM phases spread across all queries
  instead of landing on one — and reports the per-query MEDIAN
- if a prior round's BENCH file exists, a per-query ratio vs that
  baseline is attached under "delta_vs_baseline" (extra key; the
  driver contract keys are unchanged)
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from database_to_bigquery_spark.registry import all_specs
from database_to_bigquery_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def load_baseline() -> tuple[str, dict] | None:
    """Latest committed BENCH_r{N}.json at the repo root, if any."""
    here = os.path.dirname(os.path.abspath(__file__))
    cands = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            cands.append((int(m.group(1)), p))
    if not cands:
        return None
    n, path = max(cands)
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    # the driver's BENCH_r{N}.json wraps this script's JSON line under
    # "parsed" (alongside run metadata); unwrap if so
    if "queries" not in data and isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    return f"r{n:02d}", data


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    production_only = "--production" in sys.argv[1:]
    spark = get_spark("bench")
    specs = {n: s for n, s in all_specs().items() if s.headline}
    twins = sorted(n for n, s in specs.items() if s.scale_twin)
    if production_only:
        specs = {n: s for n, s in specs.items() if not s.scale_twin}

    # warmup: tiny query to absorb JVM/codegen startup, plus one no-op
    # pandas UDF to spawn the Python worker pool (first Arrow crossing
    # pays worker fork + numpy import; that's session setup, not query
    # cost — workers are reused afterwards)
    force(spark.read.parquet(os.path.join(sf_dir, "region.parquet")))

    def _warm(pdf):
        import numpy as np  # noqa — pre-import in every pooled worker

        return pdf

    force(
        spark.range(64)
        .withColumn("g", F.col("id") % 32)
        .groupBy("g")
        .applyInPandas(_warm, "id long, g long")
    )

    # warmup 2: one smallest-SF run of the heaviest plan shape (shingle
    # mining → blocked applyInPandas matmul → broadcast join-back).
    # This compiles the codegen stages and pushes real Arrow batches
    # through every pooled worker once, so the timed section below
    # measures steady-state query cost rather than first-plan
    # compilation — the regime a long-lived cluster actually runs in.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        from database_to_bigquery_spark.operators.dedup import dedup_ngram_jaccard

        force(dedup_ngram_jaccard(spark, warm_dir))

    samples: dict[str, list[float]] = {name: [] for name in specs}
    for _ in range(n_runs):
        for name in sorted(specs):
            t0 = time.time()
            force(specs[name].fn(spark, sf_dir))
            samples[name].append(time.time() - t0)

    timings = {
        name: round(statistics.median(ts), 3) for name, ts in sorted(samples.items())
    }

    out = {
        "metric": (
            "production_queries_total_wall"
            if production_only
            else "headline_queries_total_wall"
        ),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": n_runs,
        # the production-profile view of THIS run's timings: exact
        # scale twins excluded (identical to --production output when
        # production_only, a strict subset otherwise)
        "production": {
            "value": round(
                sum(t for n, t in timings.items() if n not in twins), 3
            ),
            "n_queries": sum(1 for n in timings if n not in twins),
            "excluded_twins": twins,
        },
    }
    baseline = load_baseline()
    if baseline is not None:
        tag, base = baseline
        base_q = base.get("queries", {})
        common = {n for n in timings if isinstance(base_q.get(n), (int, float))}
        if common:
            out["delta_vs_baseline"] = {
                "baseline": tag,
                "total_ratio": round(
                    sum(timings[n] for n in common)
                    / max(1e-9, sum(base_q[n] for n in common)),
                    3,
                ),
                "per_query_ratio": {
                    n: round(timings[n] / max(1e-9, base_q[n]), 2)
                    for n in sorted(common)
                },
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
