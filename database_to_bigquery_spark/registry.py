"""Query registry backing the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 registers a QuerySpec:
a named PySpark implementation plus (where SQL-expressible) the ANSI
SQL twin that DuckDB runs as the correctness oracle. The driver
compares row count + schema + order-insensitive value hash, sorting
columns by name — so Spark and oracle column names MUST match
(alias everything on both sides).

Conventions that keep the hash comparison stable across engines:
  * every floating-point aggregate is ROUND()ed identically on both
    sides (sum-of-doubles is order-dependent at the ulp level; a
    2-to-6-decimal round absorbs it),
  * integer sums are CAST(... AS BIGINT) in the oracle (DuckDB widens
    integer sums to HUGEINT, Spark to long),
  * ranking windows always carry a unique tie-break column,
  * LIMIT queries order by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None → driver records rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def query(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator form: @query("q1", oracle=SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        register(QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, doc=fn.__doc__ or ""))
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all operator modules (side-effect: registration) and
    return the full registry."""
    # Imports deferred so `import database_to_bigquery_spark` stays cheap.
    from .operators import (  # noqa: F401
        behavioral,
        dedup,
        graph,
        llm_filters,
        multimodal,
        pipeline_ops,
        profiling,
        relational,
        relational_ext,
        reshape,
        similarity,
        skew,
        sql_surface,
        text_analysis,
        timeseries,
        tpch_extra,
        training_prep,
        udfs,
    )
    from .streaming import batch_equiv  # noqa: F401

    return dict(_REGISTRY)
