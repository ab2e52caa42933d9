"""Full-text retrieval: BM25 scoring and top-k search over a corpus.

The reference has no retrieval operator (its closest analogue is the
Athena scan feeding IPInsights, NB cell 7); this module adds the
standard training-data-curation capability: score documents against a
set of keyword queries with BM25 (the Robertson/Lucene variant) and
return the top-k per query — the primitive behind corpus search,
counterfactual mining, and retrieval-based quality filters.

Scale design (100 TB corpus, handful-to-thousands of queries):

- The query-term dimension is TINY and is broadcast; the (doc, token)
  stream is filtered to query terms BEFORE any shuffle, so the tf
  aggregation carries at most |docs| x |query_terms| rows, not the
  full posting list of the corpus.
- Document length (dl) is computed narrowly per row (size of the token
  array) — no extra shuffle; N and avgdl reduce to one scalar row that
  broadcast-joins back.
- Per-term document frequencies aggregate over the filtered stream:
  |query_terms| groups, map-side partials.
- The final per-(query, doc) score sum shuffles |candidate docs| x
  |queries| rows; top-k resolves with a rank window per query_id
  (queries are few; for query sets large enough to skew a partition,
  salt the sum stage — same recipe as operators/skew.py).

No Python UDFs anywhere — the whole plan is JVM expressions inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import TOKEN_RE

# (query_id, query text) — fixed keyword queries over the harness
# corpus vocabulary; callers pass their own in production.
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "spark stream join"),
    (1, "vector hash scan"),
    (2, "customer order query"),
)


def _query_terms(spark, queries):
    rows = []
    for qid, text in queries:
        for tok in sorted({t for t in text.lower().split() if t}):
            rows.append((int(qid), tok))
    return spark.createDataFrame(rows, "query_id int, tok string")


def bm25_topk(
    docs: DataFrame,
    queries=BM25_QUERIES,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    cache_key: str | None = None,
) -> DataFrame:
    """Top-k documents per keyword query under BM25.

    score(d, q) = sum over t in q of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) — the Lucene
    formulation (always positive, saturating).

    Output: (query_id, doc_id, score, rank), rank in 1..k per query,
    ties broken on lower doc_id for a deterministic LIMIT.
    """
    spark = docs.sparkSession
    qt = _query_terms(spark, queries)

    # both the token stream and the doc lengths reduce from the shared
    # per-corpus token-array pass (operators/text.token_arrays) — bm25
    # previously paid the regexp tokenize TWICE per run (toks + dl);
    # the factored expression is identical, so results are unchanged
    from .text import token_arrays

    ta = token_arrays(docs, cache_key)
    toks = ta.select("doc_id", F.explode("toks").alias("tok"))
    # doc length: narrow per-row compute, no shuffle
    dl = ta.select(
        "doc_id", F.size("toks").cast("double").alias("dl")
    )
    # one scalar row (N, avgdl), broadcast back into the plan
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    # filter to query vocabulary BEFORE the wide stages
    qtoks = toks.join(F.broadcast(qt.select("tok").distinct()), "tok")
    tf = qtoks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df_ = qtoks.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )

    # idf computed ONCE per query-vocabulary term (tiny frame) with the
    # libm ln twin — JVM Math.log is 1 ulp off DuckDB's libm on ~1.4%
    # of arguments, which was the last float drift in this query's
    # score fold (functions/libm.py; VERDICT r6 #5)
    from ..functions.libm import libm_log

    df_ = (
        df_.crossJoin(F.broadcast(stats))
        .select(
            "tok",
            "df",
            libm_log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = F.col("idf") * F.col("tf") * F.lit(k1 + 1.0) / denom

    # fold the per-term contributions in token order (array_sort on the
    # (tok, contrib) structs -> sequential fold): bit-identical to the
    # oracle's list_sum(list(... ORDER BY tok)) — a plain SUM would be
    # partition-order-dependent and could split exact ties differently
    # across engines, flipping the rank tiebreak
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .join(F.broadcast(qt), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("tok", contrib.alias("c")))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk_sql(
    queries=BM25_QUERIES, k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB value oracle: same formula, independently re-derived."""
    q_rows = ", ".join(
        f"({int(qid)}, '{tok}')"
        for qid, text in queries
        for tok in sorted({t for t in text.lower().split() if t})
    )
    return f"""
WITH qt(query_id, tok) AS (VALUES {q_rows}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
  FROM documents
),
dl AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
),
qtoks AS (
  SELECT t.doc_id, t.tok FROM toks t
  WHERE t.tok IN (SELECT DISTINCT tok FROM qt)
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM qtoks GROUP BY doc_id, tok
),
df AS (
  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM qtoks GROUP BY tok
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         list_sum(list(
           ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * {k1 + 1.0!r}
           / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl.dl / s.avgdl))
           ORDER BY tf.tok
         )) AS score
  FROM tf
  JOIN df ON df.tok = tf.tok
  JOIN qt q ON q.tok = tf.tok
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id, score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""
