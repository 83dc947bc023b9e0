"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row count + schema-width + order-insensitive value hash.

Usage: python tools/check_oracle.py [--sf-dir DIR] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from database_to_bigquery_spark.data import TABLE_NAMES
from database_to_bigquery_spark.registry import all_specs
from database_to_bigquery_spark.session import get_spark


def normalize_cell(v) -> str:
    import datetime as dt
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match driver-style float canonicalization: repr of rounded
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, list):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    specs = all_specs()
    names = args.names or sorted(specs)
    failures = []
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(spec.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount {len(s_rows)} vs {len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"columns {sorted(s_cols)} vs {sorted(o_cols)}")
        elif value_hash(s_rows, s_cols) != value_hash(o_rows, o_cols):
            problems.append("value hash mismatch")
            # show first differing rows for debugging
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            ss = sorted("\x1f".join(normalize_cell(r[i]) for i in order_s) for r in s_rows)
            oo = sorted("\x1f".join(normalize_cell(r[i]) for i in order_o) for r in o_rows)
            for a, b in zip(ss, oo):
                if a != b:
                    problems.append(f"  spark:  {a[:300]}")
                    problems.append(f"  oracle: {b[:300]}")
                    break
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"OK    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
