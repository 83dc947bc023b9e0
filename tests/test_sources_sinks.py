"""S1/S2/S3 source surface + sink option mapping (no live DB/BQ in the
container — the option maps and SQL text are the testable contract)."""

from __future__ import annotations

import datetime as dt

from database_to_bigquery_spark.sources.catalog import (
    REFERENCE_ALLOWLIST,
    discover_tables,
)
from database_to_bigquery_spark.sources.jdbc import (
    JdbcSourceSpec,
    incremental_predicate,
    jdbc_reader_options,
)


def test_discover_tables_allowlist(spark, sf_dir):
    out = discover_tables(spark, sf_dir, allowlist=["lineitem", "orders", "nope"])
    assert sorted(r["table_name"] for r in out.collect()) == ["lineitem", "orders"]


def test_discover_tables_all(spark, sf_dir):
    assert discover_tables(spark, sf_dir).count() == 10


def test_reference_allowlist_preserved():
    # mysql_operations.py:45 verbatim
    assert REFERENCE_ALLOWLIST == ["backup_log", "daily_log", "servers_temp"]


def test_jdbc_partitioned_read_options():
    spec = JdbcSourceSpec(
        url="jdbc:mysql://h:3306/db",
        table="backup_log",
        partition_column="id",
        lower_bound="0",
        upper_bound="1000000",
        num_partitions=16,
    )
    opts = jdbc_reader_options(spec)
    # the parallel-read contract: without these four, a JDBC scan is a
    # single connection (the reference's bottleneck, mysql_operations.py:27)
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"


def test_incremental_predicate_is_sargable():
    pred = incremental_predicate("backup_date", dt.date(2024, 1, 10))
    assert pred == "backup_date >= '2024-01-10' AND backup_date < '2024-01-11'"
    assert "DATE(" not in pred  # unlike mysql_operations.py:23 — index-friendly
