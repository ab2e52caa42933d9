"""Byte-pair-encoding vocabulary induction over the corpus.

The tokenizer-training half of a data pipeline: classic BPE on the word
frequency dictionary (count adjacent symbol pairs weighted by word
frequency; merge the most frequent pair; repeat). Two surfaces:

- ``bpe_pair_counts``: ONE merge round's pair statistics, oracle-backed
  (pure SQL twin). Plan: token explode -> vocab-sized (token, count)
  agg -> per-token adjacent char pairs -> pair-count agg -> top-k under
  the total order (count desc, pair asc). Two hash exchanges, both on
  vocabulary-sized keys — corpus size only enters through the first
  narrow explode+count, exactly like corpus_top_terms.
- ``learn_merges``: the iterative trainer. After the first vocab agg
  the working set IS the vocabulary (words as symbol arrays + counts),
  so each merge round is: pair-count agg over the vocab frame -> argmax
  pair to the driver (one row) -> JVM fold rewriting symbol arrays
  (greedy leftmost, non-overlapping — folding left keeps a symbol just
  merged from re-merging in the same round, matching the reference BPE
  algorithm). localCheckpoint every few rounds caps lineage, the same
  pattern as dedup's fixpoint components. Ties on pair count break by
  lexicographic (left, right), so the merge table is reproducible
  across partitionings.

At 100 TB the corpus pass is the only data-sized stage; rounds iterate
on a |vocab| frame (millions of rows at web scale — still cluster-tiny,
and every step is a hash agg + narrow map, no corpus rescans).
No reference analogue (beyond-reference surface per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import TOKEN_RE


def _vocab(docs: DataFrame) -> DataFrame:
    """(token, n) word-frequency dictionary — the BPE working set."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0)
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def bpe_pair_counts(docs: DataFrame, top_k: int = 30) -> DataFrame:
    """First-round BPE pair statistics: adjacent character pairs across
    the word-frequency dictionary, weighted by word count; top_k rows
    ranked by (count desc, pair asc) — a total order, so the cut is
    deterministic."""
    from pyspark.sql import Window

    vocab = _vocab(docs)
    pairs = vocab.select(
        "n",
        F.explode(
            F.when(
                F.length("tok") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("tok") - 1),
                    lambda i: F.substring(F.col("tok"), i, 2),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(
        F.sum("n").cast("long").alias("pair_count")
    )
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return (
        counts.withColumn("merge_rank", F.row_number().over(w).cast("long"))
        .where(F.col("merge_rank") <= top_k)
        .select("merge_rank", "pair", "pair_count")
    )


def bpe_pair_counts_sql(top_k: int = 30) -> str:
    return f"""
WITH vocab AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
        FROM documents)
  GROUP BY tok
),
pairs AS (
  SELECT n,
         unnest(list_transform(generate_series(1, length(tok) - 1),
                               i -> substr(tok, i, 2))) AS pair
  FROM vocab
),
counts AS (
  SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
  FROM pairs GROUP BY pair
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS BIGINT)
         AS merge_rank,
       pair, pair_count
FROM counts
QUALIFY merge_rank <= {top_k}
"""


def _chars(col):
    """Symbol array of single characters (split('') has engine-varying
    trailing-empty behavior — substring probing is unambiguous)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: F.substring(col, i, 1)
    )


def _sym_pairs(syms):
    """Adjacent (left, right) symbol pairs, empty for 1-symbol words."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def learn_merges(
    docs: DataFrame,
    n_merges: int = 16,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (merge_rank, left, right, merged, pair_count). Stops early when no
    pair occurs at least twice."""
    spark = docs.sparkSession
    vocab = (
        _vocab(docs)
        .select(_chars(F.col("tok")).alias("syms"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for r in range(n_merges):
        top = (
            vocab.select("n", F.explode(_sym_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").cast("long").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .first()
        )
        if top is None or top.c < 2:
            break
        a, b, ab = top.l, top.r, top.l + top.r
        merges.append((r + 1, a, b, ab, top.c))

        def fold(syms, _a=a, _b=b, _ab=ab):
            # greedy leftmost rewrite: append, except when the incoming
            # symbol is _b and the last emitted symbol is _a — then the
            # pair collapses. try_element_at(-1) is NULL on the empty
            # array, so the first symbol always appends.
            return F.aggregate(
                syms,
                F.array().cast("array<string>"),
                lambda out, x: F.when(
                    (F.try_element_at(out, F.lit(-1)) == _a) & (x == _b),
                    F.concat(
                        F.slice(out, 1, F.size(out) - 1), F.array(F.lit(_ab))
                    ),
                ).otherwise(F.concat(out, F.array(x))),
            )

        vocab = vocab.select(fold(F.col("syms")).alias("syms"), "n")
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)

    return _merge_table(spark, merges)


def _merge_table(spark: SparkSession, merges: list[tuple]) -> DataFrame:
    schema = (
        "merge_rank long, left string, right string, merged string, "
        "pair_count long"
    )
    return spark.createDataFrame(merges, schema)
