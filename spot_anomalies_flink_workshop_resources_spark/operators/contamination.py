"""Train/eval decontamination: n-gram overlap of held-out documents
against the training split.

The canonical pre-release check on a training corpus: for every
document in the TEST split (same content-stable md5 split as
``pipeline_ops.corpus_split`` — reshuffles never move documents between
splits), measure what fraction of its word n-gram shingles also occur
anywhere in the TRAIN split, and flag documents above a contamination
threshold. Shares the shingle definition with the dedup family
(``dedup._shingles`` / ``_shingles_sql``), so "contaminated" here means
exactly what "near-duplicate" means there.

Plan shape: one shingle explode over the corpus (narrow), a DISTINCT
on train shingles (shuffle on token — n-gram posting lists stay short,
the same property that keeps the jaccard inverted index sub-quadratic),
a left join of test shingles against that set (token-hash shuffle), and
a per-test-doc rollup. At 100 TB the refinement is a bloom filter over
train shingle hashes broadcast to the test side as a pre-join prune —
the join stays the exactness backstop; the bloom only thins its input.

No reference analogue (beyond-reference surface per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles, _shingles_sql

CONTAMINATION_THRESHOLD = 0.8


def _split_expr(doc_id_col):
    """The corpus_split assignment (md5 bucket 80/10/10), computed from
    doc_id alone so shingle rows don't need a join back to documents."""
    bucket = (
        F.conv(F.substring(F.md5(doc_id_col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def decontaminate(
    docs: DataFrame,
    shingle_n: int = 3,
    threshold: float = CONTAMINATION_THRESHOLD,
) -> DataFrame:
    """Per TEST-split document: distinct shingle count, how many of
    those shingles occur in any TRAIN-split document, the contamination
    fraction, and a flag at ``threshold``."""
    sh = _shingles(docs, shingle_n).withColumn(
        "_split", _split_expr(F.col("doc_id"))
    )
    train_toks = (
        sh.where(F.col("_split") == "train").select("tok").distinct()
    )
    test_sh = sh.where(F.col("_split") == "test").select("doc_id", "tok")
    marked = test_sh.join(
        train_toks.withColumn("_hit", F.lit(1)), "tok", "left"
    )
    n_sh = F.count(F.lit(1)).cast("long")
    n_hit = F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
    return marked.groupBy("doc_id").agg(
        n_sh.alias("n_shingles"),
        n_hit.alias("n_contaminated"),
        (n_hit.cast("double") / n_sh).alias("contamination_frac"),
        ((n_hit.cast("double") / n_sh) >= F.lit(float(threshold))).alias(
            "is_contaminated"
        ),
    )


def decontaminate_sql(
    shingle_n: int = 3, threshold: float = CONTAMINATION_THRESHOLD
) -> str:
    return f"""
WITH sh AS ({_shingles_sql(shingle_n)}),
labeled AS (
  SELECT doc_id, tok,
         CASE
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % 100 < 80 THEN 'train'
           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % 100 < 90 THEN 'valid'
           ELSE 'test'
         END AS split
  FROM sh
),
train_toks AS (SELECT DISTINCT tok FROM labeled WHERE split = 'train'),
test_sh AS (SELECT doc_id, tok FROM labeled WHERE split = 'test')
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN tr.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST(SUM(CASE WHEN tr.tok IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS contamination_frac,
       (CAST(SUM(CASE WHEN tr.tok IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*)) >= {float(threshold)!r} AS is_contaminated
FROM test_sh t LEFT JOIN train_toks tr ON t.tok = tr.tok
GROUP BY t.doc_id
"""
