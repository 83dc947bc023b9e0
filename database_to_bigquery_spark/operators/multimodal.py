"""X15: multimodal columns — binary payloads with typed metadata.

Design (for real image/audio/video at 100 TB):
  * payloads are opaque `binary` columns; metadata is a typed struct
    (mime, n_bytes, checksum) carried alongside — never parsed on the
    driver;
  * decode / feature-extraction / resize / frame-sample run as
    Arrow-batched `mapInPandas` over partition-local batches, so
    per-record codec work scales linearly with executors;
  * the actual codec calls are STUBBED (no image/audio libs in this
    container): `decode_image_batch(use_fake_codec=False)` raises
    NotImplementedError; the deterministic fake implementation proves
    the Spark-side plumbing (schema, batch shape, Arrow transfer) —
    which is real and tested.

The fixture corpus has no binary column, so the oracle-checked query
manufactures payloads from document text (UTF-8 bytes) — byte-level
semantics identical in Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query

DECODE_SCHEMA = "doc_id long, width int, height int, mean_luma double"


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decode: derives a plausible
    (width, height, mean_luma) from the bytes themselves."""
    n = len(payload)
    return {
        "width": 16 + n % 64,
        "height": 16 + (n // 64) % 64,
        "mean_luma": float(sum(payload[:64]) % 256),
    }


def decode_image_batch(
    use_fake_codec: bool = False,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the mapInPandas operator: (doc_id, payload: bytes) →
    decoded features, one Arrow batch at a time.

    A real implementation would call PIL/libvips per batch; that
    library is not in this container, so with use_fake_codec=False the
    operator raises — a clearly-marked stub per the build contract.
    The flag is captured in the closure so it ships to executors.
    """

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake_codec:
                raise NotImplementedError(
                    "image codec not available in this container; "
                    "pass use_fake_codec=True for the deterministic fake"
                )
            feats = pdf["payload"].map(lambda p: _fake_decode(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "mean_luma": feats.map(lambda f: f["mean_luma"]),
                }
            )

    return _decode


def with_payload(documents: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct —
    the canonical multimodal row shape."""
    payload = F.col("text").cast("binary")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def decoded_features(documents: DataFrame, use_fake_codec: bool = False) -> DataFrame:
    """The full multimodal pipeline: payload column → mapInPandas decode."""
    return (
        with_payload(documents)
        .select("doc_id", "payload")
        .mapInPandas(decode_image_batch(use_fake_codec), schema=DECODE_SCHEMA)
    )


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text)                                  AS checksum,
           'application/octet-stream'                 AS mime
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload construction + metadata extraction, flattened for
    the oracle (byte length and checksum computed on the payload
    itself, proving binary round-trip fidelity)."""
    d = load_table(spark, sf_dir, "documents")
    p = with_payload(d)
    return p.select(
        "doc_id",
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.mime").alias("mime"),
    )


@query("mm_fake_decode")  # fake codec → rows-only check
def mm_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pipeline with the deterministic fake codec — proves
    the mapInPandas batch plumbing (schema, Arrow transfer, partition
    parallelism) without real codecs."""
    d = load_table(spark, sf_dir, "documents")
    return decoded_features(d, use_fake_codec=True)
