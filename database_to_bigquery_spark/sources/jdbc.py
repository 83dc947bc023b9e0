"""S2/S3: JDBC source with partitioned parallel reads.

The reference reads whole tables into driver pandas via SQLAlchemy
(reference mysql_operations.py:25-27) — single connection, driver-RAM
bound. The Spark-native equivalent splits the scan into
``numPartitions`` concurrent range queries so a 1000-executor cluster
reads a 100 TB table in parallel, and pushes the incremental date
predicate (reference :21-23) into the source as a sargable range.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSourceSpec:
    url: str
    table: str
    # Parallel read: split on a numeric/date column into numPartitions
    # range queries. Without these, a JDBC read is one connection.
    partition_column: str | None = None
    lower_bound: str | None = None
    upper_bound: str | None = None
    num_partitions: int = 32
    fetch_size: int = 10_000
    properties: dict[str, str] = field(default_factory=dict)


def jdbc_reader_options(spec: JdbcSourceSpec) -> dict[str, str]:
    """The option map for ``spark.read.format('jdbc')`` — factored out
    so tests can assert on it without a live database."""
    opts: dict[str, str] = {
        "url": spec.url,
        "dbtable": spec.table,
        "fetchsize": str(spec.fetch_size),
        **spec.properties,
    }
    if spec.partition_column:
        opts.update(
            partitionColumn=spec.partition_column,
            lowerBound=str(spec.lower_bound),
            upperBound=str(spec.upper_bound),
            numPartitions=str(spec.num_partitions),
        )
    return opts


def incremental_predicate(column: str, day: dt.date) -> str:
    """S3 as a sargable range (index-friendly), not the reference's
    `DATE(col) = 'yesterday'` (reference mysql_operations.py:23) which
    defeats source-side indexes by wrapping the column in a function."""
    nxt = day + dt.timedelta(days=1)
    return f"{column} >= '{day:%Y-%m-%d}' AND {column} < '{nxt:%Y-%m-%d}'"


def read_jdbc(spark: SparkSession, spec: JdbcSourceSpec, where: str | None = None) -> DataFrame:
    """Build the partitioned JDBC scan; `where` (e.g. the incremental
    predicate) lands in a pushed-down filter."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_reader_options(spec).items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.where(where) if where else df
