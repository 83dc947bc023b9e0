"""X17: the Python UDF surface — Arrow-vectorized only.

The engine's policy (SURVEY.md §4): built-in functions for everything
expressible; when Python is genuinely needed, ONLY Arrow-batched forms
(pandas_udf scalar / applyInPandas grouped) — never row-at-a-time
Python UDFs. Both entries here are oracle-checked against pure-SQL
equivalents, proving the UDF path is semantics-preserving.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, ROUND(LN(1 + value * 2), 6) AS log_scaled
    FROM events WHERE event_id < 2000
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-batched): log1p(2v). The same math is
    one F.log1p call — the point is validating the Arrow path end-to-
    end against the SQL oracle."""

    @F.pandas_udf("double")
    def log_scaled(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.log1p(v * 2))

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select("event_id", F.round(log_scaled("value"), 6).alias("log_scaled"))


@query(
    "udf_grouped_zscore",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 4) AS zscore
    FROM events
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas: per-event-type z-score, each group as one
    pandas DataFrame (Arrow transfer both ways).

    Scale: one shuffle on event_type; a skewed type is AQE's problem,
    and the per-group state is bounded by the group, not the dataset.
    pandas std(ddof=1) == STDDEV_SAMP by construction.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        out["zscore"] = ((pdf["value"] - mu) / sd).round(4)
        return out

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, zscore double"
    )


@query(
    "udtf_word_chunks",
    oracle="""
    WITH w0 AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS i
      FROM documents WHERE doc_id < 20),
    w AS (
      SELECT doc_id, word,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j
      FROM w0 WHERE LENGTH(word) > 0),
    g AS (
      SELECT doc_id, CAST((j - 1) // 20 AS INT) AS chunk_idx,
             string_agg(word, ' ' ORDER BY j) AS chunk,
             COUNT(*) AS n_words
      FROM w
      GROUP BY doc_id, CAST((j - 1) // 20 AS INT))
    SELECT doc_id, chunk_idx, chunk, CAST(n_words AS BIGINT) AS n_words
    FROM g
    """,
)
def udtf_word_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 4): one input row → N output
    rows — the LLM context-window chunker: each document becomes
    20-word chunks with positions. The lateral-join surface for Python
    logic that genuinely changes cardinality (parsers, tokenizer-aware
    chunkers).

    Scale: UDTFs run per-partition like any map-side op — no shuffle;
    cardinality expansion happens executor-side. (A production chunker
    would count model tokens, not words; 20 words keeps the oracle
    expressible in SQL.)
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_words long")
    class WordChunks:
        def eval(self, text: str):
            words = [w for w in text.split(" ") if w]
            for c in range(0, len(words), 20):
                chunk = words[c : c + 20]
                yield c // 20, " ".join(chunk), len(chunk)

    spark.udtf.register("word_chunks", WordChunks)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, c.chunk_idx, c.chunk, c.n_words
        FROM docs_udtf, LATERAL word_chunks(text) c
        """
    )


@query(
    "udf_grouped_agg_weighted",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value * (user_id % 7 + 1)) / SUM(user_id % 7 + 1), 4) AS weighted_avg
    FROM events
    GROUP BY event_type
    """,
)
def udf_grouped_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf (a user-defined aggregate): weighted
    average with a deterministic per-row weight. Arrow ships each
    group's columns as one pandas Series pair; the UDAF body is pure
    numpy. This is the UDAF extension seam — Spark has no Python UDAF
    other than this form.

    Scale note: GROUPED_AGG does NOT do partial aggregation (every raw
    row crosses the shuffle) — fine for moderate group counts, but the
    docstring-of-record is: if the aggregate is algebraic, write it
    with built-ins (the oracle's SUM/SUM form) and keep map-side
    combine. The UDAF form exists for genuinely non-algebraic
    aggregates (trimmed means, quantile sketches with custom merge)."""
    import pandas as pd

    @F.pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        import numpy as np

        return float(np.dot(v, w) / w.sum())

    ev = load_table(spark, sf_dir, "events").withColumn(
        "w", (F.col("user_id") % 7 + 1).cast("double")
    )
    return ev.groupBy("event_type").agg(
        F.round(weighted_avg("value", "w"), 4).alias("weighted_avg")
    )


@query(
    "udf_arrow_vector_norm",
    oracle="""
    SELECT vec_id,
           ROUND(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
    FROM embeddings WHERE vec_id < 500
    """,
)
def udf_arrow_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python boundary: batches cross
    as raw Arrow RecordBatches (no pandas materialization, zero-copy
    into numpy), the norm is one vectorized einsum over the
    flattened FixedSize/VariableList values, and the result goes back
    as an Arrow batch. This is the seam for Python libraries that
    speak Arrow natively (polars, faiss wrappers, tokenizers) — a
    step below the pandas_udf forms in per-batch overhead.

    (The same math runs pure-JVM in q_array_functions; this entry
    exists to pin the mapInArrow plumbing with an oracle.)"""
    import pyarrow as pa

    def batch_norms(it):
        import numpy as np

        for batch in it:
            vec_ids = batch.column("vec_id")
            emb = batch.column("embedding")
            # ListArray → (n, dim) without per-row Python: values are
            # contiguous when offsets are regular (fixture dim is fixed)
            lens = np.diff(emb.offsets.to_numpy())
            vals = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
            mat = vals.reshape(len(lens), lens[0])
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            yield pa.RecordBatch.from_arrays(
                [vec_ids, pa.array(np.round(norms, 4), pa.float64())],
                ["vec_id", "l2_norm"],
            )

    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 500)
        .select("vec_id", "embedding")
    )
    return e.mapInArrow(batch_norms, "vec_id long, l2_norm double")


@query(
    "udf_arrow_grouped_span",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(value) - MIN(value), 4) AS value_span
    FROM events
    GROUP BY event_type
    """,
)
def udf_arrow_grouped_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow (Spark 4) — the zero-copy grouped-map
    surface: each group arrives as ONE pyarrow.Table (no pandas
    conversion, no copy into numpy unless asked), the function
    returns a pyarrow.Table. This completes the X17 matrix
    (row-pandas < grouped-pandas < mapInArrow < applyInArrow); the
    computation itself (per-type count and value span) is
    deliberately oracle-trivial so the check pins the Arrow
    plumbing, not the math.

    Scale: one shuffle on the group key; group payloads stream
    through Arrow record batches — for skewed groups prefer the
    mergeable-aggregate form (this surface is for semantics that
    genuinely need the whole group, e.g. per-group model fits)."""
    import pyarrow as pa

    def span(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = table.column("value")
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": pa.array([table.num_rows], type=pa.int64()),
                "value_span": pa.array(
                    [
                        round(
                            pc.max(v).as_py() - pc.min(v).as_py(), 4
                        )
                    ],
                    type=pa.float64(),
                ),
            }
        )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInArrow(
        span, "event_type string, n long, value_span double"
    )
