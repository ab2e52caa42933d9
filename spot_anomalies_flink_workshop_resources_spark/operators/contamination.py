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
    cache_key: str | None = None,
) -> DataFrame:
    """Per TEST-split document: distinct shingle count, how many of
    those shingles occur in any TRAIN-split document, the contamination
    fraction, and a flag at ``threshold``."""
    # reduce from the family's shared shingle checkpoint when keyed
    # (jaccard/minhash/containment use the same (key, n, "shingles")
    # entry) — the train/test branches then read it instead of
    # re-exploding the corpus twice; unkeyed callers keep the plain
    # factored expression (no surprise eager checkpoint in tests)
    from .dedup import shingle_frame

    sh = (
        shingle_frame(docs, shingle_n, cache_key=cache_key)
        if cache_key is not None
        else _shingles(docs, shingle_n)
    ).withColumn("_split", _split_expr(F.col("doc_id")))
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


def bloom_build(
    toks: DataFrame,
    expected_items: int | None = None,
    bits_per_item: int = 16,
    n_hashes: int = 4,
):
    """Distributed bloom-filter build over a one-column token frame.

    Hashes are computed JVM-side (``xxhash64`` with two seeds — double
    hashing g_i = h1 + i*h2 gives ``n_hashes`` independent probes);
    each partition ORs its tokens into a local bitmap in one NumPy pass
    and only per-partition bitmaps (n_bits/8 bytes each) return to the
    driver for the final OR — no token ever leaves its executor. The
    bitmap is power-of-two sized (>= bits_per_item per expected item,
    so probe indexing is a mask, not a modulo).

    Returns (bitmap uint64 array, n_bits, n_hashes). At 16 bits/item
    with 4 probes the false-positive rate is ~0.6%.
    """
    import numpy as np
    import pandas as pd

    if expected_items is None:
        expected_items = toks.count()
    n_bits = 1 << max(10, int(expected_items * bits_per_item - 1).bit_length())
    mask = np.uint64(n_bits - 1)
    words = n_bits // 64
    hashed = toks.select(
        F.xxhash64("tok").alias("h1"), F.xxhash64("tok", F.lit(1)).alias("h2")
    )

    def build(batches):
        bm = np.zeros(words, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(n_hashes):
                idx = (h1 + np.uint64(i) * h2) & mask
                np.bitwise_or.at(
                    bm, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63))
                )
        yield pd.DataFrame({"w": [bm.view(np.int64)]})

    bm = np.zeros(words, dtype=np.uint64)
    for r in hashed.mapInPandas(build, "w array<long>").collect():
        bm |= np.asarray(r["w"], dtype=np.int64).view(np.uint64)
    return bm, n_bits, n_hashes


def bloom_mark(toks: DataFrame, bloom) -> DataFrame:
    """Append ``bloom_maybe`` to a frame with a ``tok`` column: False
    means the token is DEFINITELY not in the built set (no false
    negatives), True means it must go through the exact join."""
    import numpy as np

    bitmap, n_bits, n_hashes = bloom
    spark = toks.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)
    mask = np.uint64(n_bits - 1)
    cols = toks.columns

    def mark(batches):
        bm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64).view(np.uint64)
            maybe = np.ones(len(pdf), dtype=bool)
            for i in range(n_hashes):
                idx = (h1 + np.uint64(i) * h2) & mask
                bit = (bm[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1)
                maybe &= bit.astype(bool)
            out = pdf[cols].copy()
            out["bloom_maybe"] = maybe
            yield out

    hashed = toks.withColumn("h1", F.xxhash64("tok")).withColumn(
        "h2", F.xxhash64("tok", F.lit(1))
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in toks.schema.fields
    )
    return hashed.mapInPandas(mark, schema + ", bloom_maybe boolean")


def decontaminate_bloom(
    docs: DataFrame,
    shingle_n: int = 3,
    threshold: float = CONTAMINATION_THRESHOLD,
    bits_per_item: int = 16,
    n_hashes: int = 4,
    cache_key: str | None = None,
) -> DataFrame:
    """:func:`decontaminate` with the 100 TB bloom prefilter armed
    (VERDICT r3 #7): a broadcast bloom over the distinct train-shingle
    set prunes test shingles before the exact join — only
    bloom-positive shingles (true hits + ~0.6% false positives) pay the
    token-hash shuffle; definite misses short-circuit to _hit=0 and
    rejoin at the final per-doc rollup. Bloom negatives are definite,
    so the output is bit-identical to the unfiltered form and shares
    its oracle."""
    # reduce from the family's shared shingle checkpoint when keyed
    # (jaccard/minhash/containment use the same (key, n, "shingles")
    # entry) — the train/test branches then read it instead of
    # re-exploding the corpus twice; unkeyed callers keep the plain
    # factored expression (no surprise eager checkpoint in tests)
    from .dedup import shingle_frame

    sh = (
        shingle_frame(docs, shingle_n, cache_key=cache_key)
        if cache_key is not None
        else _shingles(docs, shingle_n)
    ).withColumn("_split", _split_expr(F.col("doc_id")))
    train_toks = sh.where(F.col("_split") == "train").select("tok").distinct()
    train_toks = train_toks.localCheckpoint(eager=True)
    bloom = bloom_build(
        train_toks, bits_per_item=bits_per_item, n_hashes=n_hashes
    )
    test_sh = sh.where(F.col("_split") == "test").select("doc_id", "tok")
    marked_bloom = bloom_mark(test_sh, bloom)
    maybe = marked_bloom.where(F.col("bloom_maybe")).drop("bloom_maybe")
    misses = (
        marked_bloom.where(~F.col("bloom_maybe"))
        .select("doc_id", "tok")
        .withColumn("_hit", F.lit(None).cast("int"))
    )
    joined = maybe.join(train_toks.withColumn("_hit", F.lit(1)), "tok", "left")
    marked = joined.select("doc_id", "tok", "_hit").unionByName(misses)
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
