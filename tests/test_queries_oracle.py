"""Every registered query runs and (where an oracle exists) matches
DuckDB value-for-value at sf0.001 — the same comparison the driver
makes at sf0.01 (SURVEY.md §5 strategy 1)."""

from __future__ import annotations

import duckdb
import pytest

from database_to_bigquery_spark.data import TABLE_NAMES
from database_to_bigquery_spark.registry import all_specs
from tools.check_oracle import value_hash

SPECS = all_specs()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        # rows-only contract: must execute and return a stable schema
        assert sdf.columns
        return
    cur = oracle_con.execute(spec.oracle)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert len(s_rows) == len(o_rows), f"rowcount {len(s_rows)} != {len(o_rows)}"
    assert sorted(sdf.columns) == sorted(o_cols)
    assert value_hash(s_rows, sdf.columns) == value_hash(o_rows, o_cols)
