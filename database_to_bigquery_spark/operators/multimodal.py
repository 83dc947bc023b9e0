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
from pyspark.sql import Window as W
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


_PH_BITS = 56  # 8 bands x 7 bits; pigeonhole: hamming <= 7 => some band equal
_PH_BANDS = 8


@query(
    "mm_phash_neardup",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             list_transform(range(1, 57), i ->
               ascii(substr(lower(text),
                 CAST(1 + ((i - 1) * LENGTH(text)) // 56 AS BIGINT), 1))) AS codes
      FROM documents WHERE LENGTH(text) >= 56),
    h AS (
      SELECT doc_id,
             list_sum(list_transform(range(1, 57), i ->
               CASE WHEN codes[i] * 56 > list_sum(codes)
                    THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS phash
      FROM px),
    bands AS (
      SELECT doc_id, phash, j AS band_idx,
             (phash >> (7 * j)) & 127 AS band_val
      FROM h, LATERAL (SELECT unnest(range(0, 8)) AS j)),
    capped AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bsz
        FROM bands) WHERE bsz <= 64),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.phash AS ha, b.phash AS hb
      FROM capped a JOIN capped b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 7
    """,
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for media payloads —
    the aHash algorithm (each "pixel" brighter than the image mean →
    1 bit) with banded pigeonhole blocking, the standard cheap
    image-dedup tier below embedding similarity.

    Pixels are proxied by 56 codepoints STRIDED across the payload
    (position 1 + (i-1)·len/56 — the downsampling a real aHash does to
    the image grid; sampling only a fixed prefix collapses a templated
    corpus into a handful of hashes and melts the band join)
    (the fixture corpus has no real images — same honest stand-in as
    the rest of this module), which keeps every step a JVM expression
    and makes the WHOLE pipeline oracle-checkable — unlike
    dedup_simhash, nothing here is rows-only. The mean-threshold test
    uses integer cross-multiplication (code·56 > Σcodes), so no
    division, no floats, no rounding anywhere. Buckets larger than 64
    docs are SKIPPED (the standard LSH hot-bucket rule: a mega-bucket
    is a mega-cluster of exact/near-exact copies that
    dedup_exact_text/dedup_minhash_lsh already catch, and joining it
    is quadratic — the sf0.1 census measured 111 s without the cap,
    1.5 s with it).

    Scale: hash build is map-only; the 56-bit hash splits into 8
    bands of 7 bits, so any pair within hamming distance 7 shares at
    least one identical band (pigeonhole) and is found by the
    (band_idx, band_val) equi-join — candidates only form within a
    bucket, never all-pairs. Exact hamming (bit_count of XOR) then
    filters the candidates. Same banded-join shape as
    dedup_simhash/dedup_minhash_lsh; at 100 TB the bucket key is
    already uniform because high bits of real aHashes are balanced."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _PH_BITS
    )
    # strided sample positions need the lambda index in substr's start
    # argument — expressed via expr (same portability note as
    # mm_audio_frames)
    px = d.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, {_PH_BITS}), i -> "
            f"ascii(substr(lower(text), "
            f"CAST(1 + ((i - 1) * length(text)) div {_PH_BITS} AS INT), 1)))"
        ).alias("codes"),
    )
    total = F.aggregate(F.col("codes"), F.lit(0), lambda a, x: a + x)
    # bit weights precomputed as Python literals (F.shiftleft takes only
    # literal shift counts); powers of two stay exact through the fold
    powers = F.array(*[F.lit(1 << k).cast("long") for k in range(_PH_BITS)])
    phash = F.aggregate(
        F.zip_with(
            F.col("codes"),
            powers,
            lambda c, p: F.when(c * _PH_BITS > F.col("t"), p).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    h = px.withColumn("t", total).select("doc_id", phash.alias("phash"))
    bands = h.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(_PH_BANDS - 1))).alias("band_idx"),
    ).withColumn(
        # SQL form: shiftright accepts a column shift count there
        "band_val",
        F.expr("shiftright(phash, band_idx * 7) & 127"),
    )
    bucket_w = W.partitionBy("band_idx", "band_val")
    bands = bands.withColumn("bsz", F.count("*").over(bucket_w)).filter(
        F.col("bsz") <= 64
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ha"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("hb"),
        "band_idx",
        "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 7)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "mm_caption_pairs",
    oracle="""
    WITH pairs AS (
      SELECT doc_id,
             octet_length(CAST(text AS BLOB))             AS n_bytes,
             LENGTH(string_split(text, ' '))              AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
               % 8                                        AS shard
      FROM documents),
    pos AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY shard
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM pairs)
    SELECT doc_id,
           CAST(shard AS INT)            AS shard,
           CAST((rn - 1) // 16 AS INT)   AS batch_idx,
           CAST(n_bytes AS BIGINT)       AS n_bytes,
           CAST(n_tokens AS BIGINT)      AS n_tokens
    FROM pos
    """,
)
def mm_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text contrastive batch builder (the CLIP training-prep
    shape): each payload is paired with its caption stats and assigned
    a reproducible (shard, batch_idx) slot — shard by md5(doc_id),
    md5-shuffled order within the shard, fixed batch size 16.

    The md5 ordering IS the training shuffle (same idiom as
    q_deterministic_shuffle): reproducible across engines, reruns, and
    partitionings, yet uncorrelated with ingestion order — so batch
    composition is stable for exact training resume. Scale: the only
    window is partitioned by shard (never global); shards stream as
    independent tasks and each writes its own batch files. Payload
    bytes stay opaque (octet_length only) — the decode leg is
    mm_fake_decode's job, not the batch builder's."""
    base = load_table(spark, sf_dir, "documents")
    pairs = base.select(
        "doc_id",
        F.octet_length(F.col("text").cast("binary")).alias("n_bytes"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % 8
        ).alias("shard"),
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("shard").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return pairs.withColumn("rn", rn).select(
        "doc_id",
        F.col("shard").cast("int").alias("shard"),
        (((F.col("rn") - 1) / 16).cast("int")).alias("batch_idx"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "n_tokens",
    )


_AF_WIN = 16  # samples per frame
_AF_HOP = 8  # hop size (50% overlap)


@query(
    "mm_audio_frames",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             list_transform(
               range(1, LEAST(LENGTH(text), 128) + 1),
               i -> ascii(substr(text, i, 1))) AS samples
      FROM documents),
    frames AS (
      SELECT doc_id, f AS frame_idx,
             list_slice(samples, f * {_AF_HOP} + 1,
                        f * {_AF_HOP} + {_AF_WIN}) AS frame
      FROM px,
           LATERAL (SELECT unnest(range(0,
             CASE WHEN len(samples) >= {_AF_WIN}
                  THEN (len(samples) - {_AF_WIN}) // {_AF_HOP} + 1
                  ELSE 0 END)) AS f))
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(len(frame) AS INT)        AS n_samples,
           CAST(list_sum(list_transform(frame, v -> v * v)) AS BIGINT)
             AS energy,
           CAST(list_max(frame) AS INT)   AS peak
    FROM frames
    """,
)
def mm_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style framing of a media payload: slice the sample stream
    into overlapping fixed windows (16 samples, hop 8 — the 25 ms /
    10 ms hop shape of every speech front-end) and emit per-frame
    energy (Σ sample²) and peak — the feature-extraction leg of an
    audio pipeline, with samples proxied by payload codepoints
    (first 128) exactly as mm_phash_neardup proxies pixels.

    Everything is JVM array arithmetic over exact integers (energy is
    an integer sum of squares — no floats at all), so the whole
    framing pipeline is oracle-checked; a real deployment swaps the
    proxy for decoded PCM behind the same mapInPandas seam as
    decode_image_batch and keeps this exact plan. Map-only: each row
    expands to its ≤15 frames in place, no shuffle anywhere."""
    d = load_table(spark, sf_dir, "documents")
    # built via expr: the lambda variable indexes substr directly
    px = d.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, least(length(text), 128)),"
            " i -> ascii(substr(text, i, 1)))"
        ).alias("samples"),
    )
    n_frames = F.when(
        F.size("samples") >= _AF_WIN,
        F.floor((F.size("samples") - _AF_WIN) / _AF_HOP).cast("int") + 1,
    ).otherwise(0)
    frames = px.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        "samples",
    ).withColumn(
        "frame",
        F.expr(f"slice(samples, frame_idx * {_AF_HOP} + 1, {_AF_WIN})"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.size("frame").cast("int").alias("n_samples"),
        F.aggregate(
            F.col("frame"),
            F.lit(0).cast("long"),
            lambda a, v: a + (v * v).cast("long"),
        ).alias("energy"),
        F.array_max("frame").cast("int").alias("peak"),
    )


# ------------------------------------------------- scene splitting ----

_SCENE_FRAME = 32  # bytes per frame
_SCENE_T = 120  # boundary when |sig diff| >= T


@query(
    "mm_scene_split",
    # Oracle is BYTE-based to match the Spark path exactly: the payload
    # is text.cast(binary) = UTF-8 bytes, so framing/signatures must use
    # octet semantics, not characters (a char oracle only agrees on pure
    # ASCII). DuckDB can't slice BLOBs, so bytes go through hex(): two
    # hex chars per byte, each parsed back via strpos on the hex
    # alphabet — bit-identical to numpy's uint8 frame sums.
    oracle=f"""
    WITH f AS (
      SELECT doc_id, CAST(i AS INT) / {_SCENE_FRAME} AS frame_idx,
             substr(hex(encode(text)), CAST(i AS INT) * 2 + 1, {_SCENE_FRAME * 2}) AS fh
      FROM documents
      CROSS JOIN LATERAL (
        SELECT unnest(range(0, octet_length(encode(text)) - {_SCENE_FRAME - 1},
                            {_SCENE_FRAME})) AS i)),
    sig AS (
      SELECT doc_id, frame_idx,
             list_sum(list_transform(range(0, {_SCENE_FRAME}),
               k -> (strpos('0123456789ABCDEF', substr(fh, CAST(2*k+1 AS INT), 1)) - 1) * 16
                  + strpos('0123456789ABCDEF', substr(fh, CAST(2*k+2 AS INT), 1)) - 1)) AS s
      FROM f),
    d AS (
      SELECT doc_id, frame_idx, s,
             ABS(s - LAG(s) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS diff
      FROM sig),
    b AS (
      SELECT doc_id, frame_idx,
             SUM(CASE WHEN diff IS NULL OR diff >= {_SCENE_T} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY frame_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_id
      FROM d)
    SELECT doc_id, CAST(scene_id AS INT) AS scene_id,
           CAST(MIN(frame_idx) AS INT) AS start_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM b GROUP BY doc_id, scene_id
    """,
)
def mm_scene_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene splitting over the frame sequence: consecutive-frame
    signature differences above a threshold open a new scene (the
    shot-boundary heuristic every keyframe-selection pipeline starts
    from); scenes come out as gaps-and-islands over the boundary
    flags. The frame signature here is the exact integer byte sum per
    {_SCENE_FRAME}-byte frame — a real pipeline swaps in a per-frame
    color histogram or pHash from the decoded stream (the
    frame_sample_batch seam); everything downstream of the signature
    — lag, threshold, island numbering, per-scene rollup — is the
    production plan and is oracle-checked exactly.

    Scale: signature extraction is a map-only Arrow pass (one row per
    frame, linear); scene assembly is ONE shuffle on doc_id shared by
    the lag window, the island cumsum, and the final rollup —
    Catalyst reuses the single sort."""
    d = load_table(spark, sf_dir, "documents")

    def frame_sigs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "s": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_frames = len(raw) // _SCENE_FRAME
                if n_frames == 0:
                    continue
                sums = (
                    raw[: n_frames * _SCENE_FRAME]
                    .reshape(n_frames, _SCENE_FRAME)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                out["doc_id"].extend([doc_id] * n_frames)
                out["frame_idx"].extend(range(n_frames))
                out["s"].extend(sums.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "s": pd.Series(out["s"], dtype="int64"),
                }
            )

    sig = (
        with_payload(d)
        .select("doc_id", "payload")
        .mapInPandas(frame_sigs, schema="doc_id long, frame_idx int, s long")
    )
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    diff = F.abs(F.col("s") - F.lag("s").over(w))
    boundary = F.when(diff.isNull() | (diff >= _SCENE_T), 1).otherwise(0)
    scenes = sig.withColumn(
        "scene_id",
        F.sum(boundary).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return scenes.groupBy("doc_id", "scene_id").agg(
        F.min("frame_idx").cast("int").alias("start_frame"),
        F.count("*").alias("n_frames"),
    ).select(
        "doc_id",
        F.col("scene_id").cast("int").alias("scene_id"),
        "start_frame",
        F.col("n_frames").cast("long").alias("n_frames"),
    )
