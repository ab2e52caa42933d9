"""Round-11 session-2 execution-rewrite equivalence tests.

Each rewrite in this session changed an operator's physical shape while
claiming an identical result; the oracle sweeps pin the registered
queries, and these tests pin the OPERATOR-level equivalence on
adversarial little inputs the testdata may not cover:

- capped ``jaccard_pairs`` (per-shingle posting arrays + bounded double
  Generate) vs the uncapped join form on the same data with a cap
  above the max document frequency — both arms must be row-identical
  (the both-arms pattern of test_blocked_cosine_fallback).
- the window-pick exact percentile (sql_price_quantiles' new form) vs
  Spark's ``percentile()`` aggregate on random grouped doubles,
  including 1-row and 2-row groups where the interpolation endpoints
  coincide.
"""

from __future__ import annotations

import random

from pyspark.sql import Row

from spot_anomalies_flink_workshop_resources_spark.operators import dedup


def _docs(spark):
    # small corpus with real shingle overlap: near-dup pair, a partial
    # overlap, a singleton
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over a lazy dog"),
        Row(doc_id=3, text="the quick brown fox sat on the mat"),
        Row(doc_id=4, text="entirely different words appear here now"),
        Row(doc_id=5, text="the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows)


def _pairs(df):
    return sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 12)) for r in df.collect()
    )


def test_capped_jaccard_array_form_matches_join_form(spark):
    docs = _docs(spark)
    # df_cap far above the max posting-list length: the cap prunes
    # nothing, so the capped ARRAY arm must equal the uncapped JOIN arm
    arr = _pairs(dedup.jaccard_pairs(docs, threshold=0.2, shingle_n=3,
                                     df_cap=1000))
    join = _pairs(dedup.jaccard_pairs(docs, threshold=0.2, shingle_n=3,
                                      df_cap=None))
    assert arr == join
    assert arr  # non-vacuous: the corpus has qualifying pairs


def test_capped_jaccard_cap_prunes_identically(spark):
    docs = _docs(spark)
    # a tight cap must drop the same hot shingles the join form's
    # freq-filter drops: compare against a manual freq-join replica
    from pyspark.sql import functions as F

    cap = 3
    arr = _pairs(dedup.jaccard_pairs(docs, threshold=0.0, shingle_n=1,
                                     df_cap=cap))
    toks = dedup.shingle_frame(docs, 1)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    capped = toks.join(freq.where(F.col("df") <= cap), "tok")
    counts = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = capped.alias("a"), capped.alias("b")
    common = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    ref = _pairs(
        common.join(ca, "doc_a").join(cb, "doc_b").select(
            "doc_a", "doc_b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
             ).alias("jaccard"),
        )
    )
    assert arr == ref
    assert arr  # the cap leaves survivors on this corpus


def test_window_pick_percentile_matches_percentile_agg(spark):
    rng = random.Random(11)
    rows = []
    # group sizes 1, 2, 3, and 97 — exercises coincident interpolation
    # endpoints (ceil(pos) == floor(pos)) and the general case
    for g, n in (("a", 1), ("b", 2), ("c", 3), ("d", 97)):
        for _ in range(n):
            rows.append(Row(g=g, v=round(rng.uniform(-100, 100), 6)))
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("pct_src")

    ref = {
        (r.g): (r.p50, r.p95, r.n)
        for r in spark.sql(
            "SELECT g, percentile(v, 0.5) p50, percentile(v, 0.95) p95, "
            "CAST(COUNT(*) AS BIGINT) n FROM pct_src GROUP BY g"
        ).collect()
    }

    from spot_anomalies_flink_workshop_resources_spark.plans import (
        relational_sql as rs,
    )

    got = {
        (r.g): (r.p50, r.p95, r.n)
        for r in spark.sql(f"""
WITH ranked AS (
  SELECT g, CAST(v AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM pct_src
),
picks AS (
  SELECT g, n, rn, v FROM ranked
  WHERE rn IN (CAST(FLOOR(0.5D*(n-1)) AS BIGINT)+1,
               CAST(CEIL(0.5D*(n-1)) AS BIGINT)+1,
               CAST(FLOOR(0.95D*(n-1)) AS BIGINT)+1,
               CAST(CEIL(0.95D*(n-1)) AS BIGINT)+1)
)
SELECT g, {rs._pick('0.5')} AS p50, {rs._pick('0.95')} AS p95,
       CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n
FROM picks GROUP BY g
""").collect()
    }
    # bit-exact: the window-pick interpolation replays Percentile's
    # exact double sequence
    assert got == ref
