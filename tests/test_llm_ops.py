"""Quality properties of the LLM-pipeline operators beyond the oracle:
MinHash recall vs exact Jaccard, LSH recall vs brute force, multimodal
stub behavior, dedup fixpoint."""

from __future__ import annotations

import pytest

from database_to_bigquery_spark.data import load_table
from database_to_bigquery_spark.operators import multimodal
from database_to_bigquery_spark.operators.dedup import (
    dedup_exact_text,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from database_to_bigquery_spark.operators.similarity import (
    sim_topk_bruteforce,
    sim_topk_lsh,
)


def test_minhash_finds_all_true_near_dups(spark, sf_dir):
    truth = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    found = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    # exact verification step means no false positives; 16x4 banding at
    # jaccard>=0.6 should catch everything on the planted pairs
    assert found == truth
    assert len(truth) > 0  # fixture plants near-dups — the test is non-vacuous


def test_lsh_topk_recall(spark, sf_dir):
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim_topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in sim_topk_lsh(spark, sf_dir).collect()
    }
    recall = len(truth & approx) / len(truth)
    # 12 tables × 4 bits on near-orthogonal random vectors: measured
    # recall 0.88 at sf0.001 / 0.84 at sf0.01 (deterministic — fixed
    # seed 7 planes, fixed fixtures), so 0.7 is a real floor, not a
    # hope (collision prob (1-θ/π)^4 per table, union of 12)
    assert recall >= 0.7


def test_exact_dedup_is_fixpoint(spark, sf_dir):
    once = dedup_exact_text(spark, sf_dir)
    assert once.groupBy("content_hash").count().filter("count > 1").isEmpty()


def test_multimodal_stub_raises_without_codec(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(2)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.decoded_features(d, use_fake_codec=False).collect()


def test_multimodal_fake_decode_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    out = multimodal.decoded_features(d, use_fake_codec=True)
    rows = out.collect()
    assert len(rows) == 10
    assert {f.name for f in out.schema.fields} == {"doc_id", "width", "height", "mean_luma"}
    assert all(16 <= r["width"] < 80 for r in rows)


def test_multimodal_payload_roundtrip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(5)
    p = multimodal.with_payload(d)
    joined = p.join(d, "doc_id").collect()
    for r in joined:
        assert bytes(r["payload"]).decode("utf-8") == r["text"]
        assert r["meta"]["n_bytes"] == len(r["text"].encode())
