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
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # Values are canonicalized so the VALUE comparison stays
        # meaningful; the TYPE mismatch (DuckDB HUGEINT/DECIMAL vs
        # Spark integer) is flagged separately in arrow_type_category.
        if v == v.to_integral_value():
            return str(int(v))
        return repr(round(float(v), 9))
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


def spark_type_category(dtype: str) -> str:
    d = dtype.lower()
    if d in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "int"
    if d in ("float", "double"):
        return "float"
    if d.startswith("decimal"):
        return "decimal"
    if d in ("string", "varchar", "char"):
        return "str"
    if d == "boolean":
        return "bool"
    if d == "date":
        return "date"
    if d.startswith("timestamp"):
        # Spark timestamps collect as naive datetimes; only an explicit
        # tz-aware dtype would be "tstz" (none of our queries emit one).
        return "ts"
    if d == "binary":
        return "bin"
    if d.startswith("array"):
        return "list"
    return "other"


def arrow_type_category(t) -> str:
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        # Driver-strict: TIMESTAMP WITH TIME ZONE (e.g. DuckDB's
        # to_timestamp result) is NOT the same type as plain TIMESTAMP —
        # the external driver failed stream_sliding_windows' schema on
        # exactly this in r10 while this gate passed it.
        return "tstz" if t.tz is not None else "ts"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return "other"


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
            s_dtypes = dict(sdf.dtypes)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            # fetch_arrow_table (not fetchall) so DuckDB type artifacts
            # that the external driver sees — HUGEINT→decimal128,
            # DECIMAL sums — reproduce locally instead of being masked
            # by the Python client's int coercion.
            tbl = con.execute(spec.oracle).fetch_arrow_table()
            o_cols = list(tbl.column_names)
            o_types = {f.name: f.type for f in tbl.schema}
            cols_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            o_rows = list(zip(*cols_data)) if tbl.num_columns else []
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = []
        for c in s_cols:
            # Driver-strict canonicalization: the external driver sorts
            # result columns with pandas (Categorical/factorize), which
            # raises `TypeError: unhashable type: 'list'` on list cells —
            # q_map_functions crashed its r10 attestation this way. Any
            # list-typed column in an oracle-bearing result is therefore
            # a FAILURE here, on either side.
            if spark_type_category(s_dtypes.get(c, "")) == "list":
                problems.append(
                    f"list column {c}: spark {s_dtypes.get(c)} — the "
                    "driver's pandas canonicalizer cannot sort list "
                    "cells; emit a deterministic string encoding "
                    "(to_json) on both sides"
                )
        for c, t in o_types.items():
            if arrow_type_category(t) == "list":
                problems.append(
                    f"list column {c}: oracle {t} — driver-uncanonicalizable"
                )
        for c in s_cols:
            if c in o_types:
                sc = spark_type_category(s_dtypes.get(c, ""))
                oc = arrow_type_category(o_types[c])
                if sc != oc:
                    problems.append(
                        f"type mismatch {c}: spark {s_dtypes.get(c)} vs "
                        f"oracle {o_types[c]}"
                    )
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
