"""S1: catalog scan / table discovery.

The reference lists MySQL base tables (`SHOW FULL TABLES WHERE
Table_type = 'BASE TABLE'`, reference mysql_operations.py:50) and
intersects with a static allowlist (:45,:51). Here the same operator
over either a live JDBC catalog or a directory of parquet tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The reference's table allowlist (reference mysql_operations.py:45).
REFERENCE_ALLOWLIST = ["backup_log", "daily_log", "servers_temp"]

#: information_schema query equivalent to the reference's SHOW FULL TABLES
#: (for the JDBC path; pushed to the source database verbatim).
BASE_TABLES_QUERY = (
    "SELECT table_name FROM information_schema.tables "
    "WHERE table_type = 'BASE TABLE' AND table_schema = '{schema}'"
)

#: The same catalog listing for engines without information_schema —
#: Apache Derby exposes SYS.SYSTABLES (TABLETYPE 'T' = user base
#: table). Lower-cased so the driver-side allowlist intersection is
#: case-insensitive like MySQL's default collation. Used by the live
#: catalog test (Derby ships inside pyspark's jars); a real MySQL
#: deployment uses BASE_TABLES_QUERY unchanged.
DERBY_BASE_TABLES_QUERY = (
    'SELECT LOWER(CAST(tablename AS VARCHAR(128))) AS "table_name" '
    "FROM SYS.SYSTABLES WHERE tabletype = 'T'"
)


def discover_tables(
    spark: SparkSession, sf_dir: str, allowlist: list[str] | None = None
) -> DataFrame:
    """List parquet tables under ``sf_dir`` ∩ allowlist, as a 1-column
    DataFrame (table_name string) — the S1 operator over a file catalog.

    Scale: catalog listing is metadata-only; at cluster scale this is a
    metastore/information_schema query, never a data scan.
    """
    names = sorted(
        f[: -len(".parquet")] for f in os.listdir(sf_dir) if f.endswith(".parquet")
    )
    if allowlist is not None:
        names = [n for n in names if n in allowlist]
    return spark.createDataFrame([(n,) for n in names], "table_name string")


def discover_tables_jdbc(
    spark: SparkSession,
    jdbc_url: str,
    schema: str,
    allowlist: list[str],
    properties: dict[str, str] | None = None,
    catalog_query: str | None = None,
) -> list[str]:
    """S1 over a live database: push the information_schema query to
    the source, intersect with the allowlist driver-side (the list is
    tiny — metadata, not data). ``catalog_query`` overrides the
    MySQL-shaped default for engines with a different catalog surface
    (e.g. DERBY_BASE_TABLES_QUERY)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("query", catalog_query or BASE_TABLES_QUERY.format(schema=schema))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    names = [r["table_name"] for r in reader.load().collect()]
    return [n for n in names if n in allowlist]
