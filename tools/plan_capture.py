"""Dump .explain('formatted') for headline (or named) queries to
plans/$PLAN_ROUND/<name>_<tag>.txt (default r11) — the optimization
round's before/after plan evidence (judge checks plan claims against
these files).

Usage: python tools/plan_capture.py TAG [--sf-dir DIR] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_to_bigquery_spark.registry import all_specs
from database_to_bigquery_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = args[0]
    names = args[1:]
    sf_dir = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf-dir":
            sf_dir = sys.argv[1:][i + 1]
            names = [n for n in names if n != sf_dir]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLAN_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_capture")
    specs = all_specs()
    if not names:
        names = sorted(n for n, s in specs.items() if s.headline)
    for name in names:
        spec = specs[name]
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # plan-time failure: record it
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
