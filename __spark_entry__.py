"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001
queries()    — one entry per implemented operator (SURVEY.md §2)
oracle_sql() — DuckDB twin for every SQL-expressible query

Backed by the QuerySpec registry in database_to_bigquery_spark.registry;
operator implementations live in database_to_bigquery_spark/operators/,
streaming/, plans/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_to_bigquery_spark.registry import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from database_to_bigquery_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }


def production_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Not part of the driver contract: the production-profile subset —
    queries() minus the intentionally scale-unsafe exact oracle twins
    (each exclusion names its in-repo scale-safe replacement via
    QuerySpec.scale_twin; see PLANS.md's scale-twin column). A 100 TB
    deployment schedules from THIS view."""
    from database_to_bigquery_spark.registry import production_specs

    return {name: spec.fn for name, spec in production_specs().items()}
