"""Token-window document chunking (overlapping sliding windows).

The context-window chunking primitive an embedding/RAG pipeline runs
before vectorizing a corpus: split each document's token sequence into
windows of ``window`` tokens starting every ``stride`` tokens (overlap
= window - stride), so every token is covered and adjacent chunks share
context. Output is one row per (doc, chunk) with the chunk's token
offset, token count, and reassembled text — deterministic, pure JVM
expressions, and exactly expressible in SQL, so it is value-oracled.

Plan shape: a single narrow map (tokenize → per-row chunk-index array →
explode); no shuffle at all. At 100 TB this is scan-bound; chunk count
per doc is data-independent arithmetic (no UDF, no per-row Python), and
output size is input × window/stride.

Chunk-count contract: a non-empty document with n tokens yields
``(max(n - window, 0) + stride - 1) div stride + 1`` chunks (pure
integer arithmetic, identical across engines); the last chunk may be
shorter than ``window``; empty documents yield no rows.

No reference analogue (beyond-reference surface per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_RE

DEFAULT_WINDOW = 64
DEFAULT_STRIDE = 48


def chunk_windows(
    docs: DataFrame,
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
) -> DataFrame:
    """One row per overlapping token window of each document.

    Output: (doc_id, chunk_id, chunk_start, chunk_tokens, chunk_text)
    where chunk_id is 0-based, chunk_start is the 0-based token offset
    (= chunk_id * stride), chunk_tokens the window's actual token count,
    and chunk_text the window's tokens joined by single spaces.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        # stride > window leaves coverage gaps AND can emit empty
        # chunks past the final token (hypothesis-found: n=2, w=1, s=3
        # plans a chunk at offset 3); overlap chunking requires
        # stride <= window, which also guarantees full token coverage
        raise ValueError("stride must be <= window (overlap >= 0)")
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0)
    )
    # integer div (not float /) so the chunk count is exact arithmetic
    # on both engines at any document length
    n_chunks = (
        F.expr(
            f"(greatest(size(_toks) - {window}, 0) + {stride - 1}) "
            f"div {stride}"
        )
        + 1
    )
    chunked = (
        docs.select("doc_id", toks.alias("_toks"))
        .where(F.size(F.col("_toks")) > 0)
        .select(
            "doc_id",
            "_toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("long").alias("chunk_start"),
            F.slice(
                F.col("_toks"), F.col("chunk_id") * stride + 1, window
            ).alias("_chunk"),
        )
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.size(F.col("_chunk")).cast("long").alias("chunk_tokens"),
        F.array_join(F.col("_chunk"), " ").alias("chunk_text"),
    )


def chunk_windows_stages_sql(
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
    relation: str = "documents",
) -> str:
    """The toks/sized/chunks CTE stage bodies of the chunking oracle
    (no WITH, no final select) — exposed for composed pipelines.
    ``relation`` swaps the source (any relation with doc_id + text),
    so a composed oracle can chunk its gated/deduped subset."""
    return f"""toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS t
  FROM {relation}
),
sized AS (
  SELECT doc_id, t, len(t) AS n,
         (GREATEST(len(t) - {window}, 0) + {stride - 1}) // {stride} + 1
           AS n_chunks
  FROM toks
  WHERE len(t) > 0
),
chunks AS (
  SELECT doc_id,
         CAST(i AS BIGINT) AS chunk_id,
         CAST(i * {stride} AS BIGINT) AS chunk_start,
         list_slice(t, i * {stride} + 1,
                    LEAST(i * {stride} + {window}, n)) AS c
  FROM sized, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
)"""


def chunk_windows_sql(
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
    relation: str = "documents",
) -> str:
    """DuckDB twin — same integer chunk-count arithmetic, list_slice
    with inclusive bounds mirroring Spark's (start, length) slice."""
    return f"""
WITH {chunk_windows_stages_sql(window, stride, relation)}
SELECT doc_id, chunk_id, chunk_start,
       CAST(len(c) AS BIGINT) AS chunk_tokens,
       array_to_string(c, ' ') AS chunk_text
FROM chunks
"""
