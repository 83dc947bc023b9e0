"""Sink surface: one writer interface, parquet impl (testable) +
BigQuery connector impl (documented; needs the spark-bigquery
connector jar at deploy time)."""

from .writers import BigQuerySink, ParquetSink, Sink, WriteMode  # noqa: F401
