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


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame_bytes binary"


def frame_sample_batch(
    frame_size: int = 32, stride: int = 4
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """mapInPandas operator for video-style frame sampling: treat the
    payload as a sequence of fixed-size frames and emit every
    `stride`-th one. A real implementation would seek keyframes via
    pyav/ffmpeg per batch; the byte-slicing fake keeps the exact
    Spark-side contract (expanding output — rows out > rows in — with
    binary columns over Arrow) testable without codecs."""

    def _sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(len(raw) // frame_size, 0)
                for k, f in enumerate(range(0, n_frames, stride)):
                    off = f * frame_size
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(raw[off : off + frame_size])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_offset": pd.Series(out["frame_offset"], dtype="int64"),
                    "frame_bytes": pd.Series(out["frame_bytes"], dtype=object),
                }
            )

    return _sample


@query(
    "mm_frame_sample",
    oracle="""
    WITH frames AS (
      -- corpus is pure ASCII (verified), so VARCHAR substr == byte
      -- slice and md5(varchar) == md5(utf8 bytes) == Spark's
      -- md5(binary slice)
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(octet_length(encode(text)) // 32 AS BIGINT) - 1)) AS f
      FROM documents
      WHERE octet_length(encode(text)) >= 32)
    SELECT doc_id,
           CAST(f // 4 AS INT)  AS frame_idx,
           CAST(f * 32 AS BIGINT) AS frame_offset,
           md5(substr(text, CAST(f * 32 + 1 AS BIGINT), 32)) AS frame_md5
    FROM frames
    WHERE f % 4 = 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the mapInPandas plumbing, every 4th
    32-byte frame of each payload, with frames checksummed so the
    oracle can verify the exact bytes that crossed the Arrow boundary
    (DuckDB slices the same payload arithmetic on its side).

    Scale: expanding map-only op — no shuffle; each Arrow batch yields
    ~len/128 output rows, and partition parallelism carries over from
    the scan."""
    d = load_table(spark, sf_dir, "documents")
    frames = (
        with_payload(d)
        .select("doc_id", "payload")
        .mapInPandas(frame_sample_batch(), schema=FRAME_SCHEMA)
    )
    return frames.select(
        "doc_id", "frame_idx", "frame_offset", F.md5("frame_bytes").alias("frame_md5")
    )


RESIZE_SCHEMA = "doc_id long, out_bytes binary, out_len int"


def resize_batch(
    stride: int = 4,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """mapInPandas operator for the resize/downsample step: keep every
    `stride`-th byte of the payload (a real implementation would be a
    vips/PIL thumbnail per batch; byte striding keeps the exact contract
    — binary in, smaller binary out, length bookkeeping — testable
    without codec libs)."""

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf["payload"].map(lambda p: bytes(p)[::stride])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_bytes": out,
                    "out_len": out.map(len).astype("int32"),
                }
            )

    return _resize


@query(
    "mm_resize",
    oracle="""
    WITH strided AS (
      SELECT doc_id,
             string_agg(substr(text, CAST(i AS BIGINT), 1), '' ORDER BY i)
               AS resized
      FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, LENGTH(text), 4)) AS i
        FROM documents
      )
      GROUP BY doc_id
    )
    SELECT doc_id,
           md5(resized)                       AS out_md5,
           CAST(LENGTH(resized) AS INT)       AS out_len
    FROM strided
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize/downsample leg of the multimodal pipeline (decode /
    feature-extract / resize / frame-sample): every 4th payload byte
    survives, output checksummed so the oracle verifies the exact bytes
    (ASCII corpus → DuckDB's strided char-agg builds the identical
    string). Map-only Arrow-batched op, no shuffle — the oracle's
    explode+string_agg formulation is the slow way; the operator is a
    row-local byte slice."""
    d = load_table(spark, sf_dir, "documents")
    resized = (
        with_payload(d)
        .select("doc_id", "payload")
        .mapInPandas(resize_batch(), schema=RESIZE_SCHEMA)
    )
    return resized.select(
        "doc_id", F.md5("out_bytes").alias("out_md5"), F.col("out_len")
    )
