"""The two-pass global-rank core must be range-fanout-agnostic.

VERDICT r6 design finding #1: the family hardcoded
``repartitionByRange(32, …)`` — the right SHAPE (the SinglePartition
offsets stage sees one long per partition, never the corpus) but a
straggler/spill wall at 100 TB (~3 TB/task). The width is now derived
(``data.range_fanout``); these tests prove the derivation is safe: the
offset arithmetic is partition-count-agnostic BY CONSTRUCTION, so any
width (including degenerate 1 and a prime that misaligns every range
boundary) yields byte-identical results.
"""

from __future__ import annotations

import os

import pytest

from database_to_bigquery_spark.data import load_table, range_fanout


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("width", ["1", "7"])
def test_global_ranks_width_agnostic(spark, sf_dir, width, monkeypatch):
    from database_to_bigquery_spark.operators.skew import q_global_ranks_scalable

    baseline = _rows(q_global_ranks_scalable(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_RANGE_FANOUT", width)
    assert _rows(q_global_ranks_scalable(spark, sf_dir)) == baseline


@pytest.mark.parametrize("width", ["1", "7"])
def test_chunk_manifest_width_agnostic(spark, sf_dir, width, monkeypatch):
    from database_to_bigquery_spark.operators.training_prep import llm_chunk_manifest

    baseline = _rows(llm_chunk_manifest(spark, sf_dir))
    monkeypatch.setenv("SPARK_GRAFT_RANGE_FANOUT", width)
    assert _rows(llm_chunk_manifest(spark, sf_dir)) == baseline


def test_fanout_derivation(spark, sf_dir, monkeypatch):
    """Floor wins at fixture scale; override wins when set; the size
    term scales the width once estimated input exceeds the split size."""
    o = load_table(spark, sf_dir, "orders")
    assert range_fanout(o) >= 32

    monkeypatch.setenv("SPARK_GRAFT_RANGE_FANOUT", "5")
    assert range_fanout(o) == 5
    monkeypatch.delenv("SPARK_GRAFT_RANGE_FANOUT")

    # Simulate a big input by shrinking the per-partition target: the
    # width must now exceed the floor (est_bytes / target dominates).
    est = int(o._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(est // 100, 1)))
        assert range_fanout(o) >= 100
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
