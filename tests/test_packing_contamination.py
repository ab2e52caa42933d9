"""Unit tests for sequence packing (distributed prefix sum) and
train/test decontamination. Cross-engine value equality is covered by
the corpus_pack_sequences / corpus_decontaminate oracles; these pin the
semantics and the distributed-equals-global property on adversarial
layouts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.operators.contamination import (
    decontaminate,
)
from spot_anomalies_flink_workshop_resources_spark.operators.packing import (
    pack_sequences,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _doc_rows(texts_by_id):
    return [(i, t, "en", "s0", len(t)) for i, t in texts_by_id.items()]


def _split_of(doc_id: int) -> str:
    bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
    return "train" if bucket < 80 else ("valid" if bucket < 90 else "test")


def test_pack_sequences_matches_global_window(spark):
    # 300 docs, adversarial partitioning (7 slices, unordered ids)
    rows = _doc_rows({i: ("tok " * (1 + i % 9)).strip() for i in range(300)})
    docs = spark.createDataFrame(rows, DOCS_SCHEMA).repartition(7)
    got = pack_sequences(docs, budget_tokens=50)

    naive = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    expect = naive.select(
        "doc_id",
        "n_tokens",
        F.row_number().over(Window.orderBy("h")).cast("long").alias(
            "shuffle_rank"
        ),
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 50.0)
        .cast("long")
        .alias("seq_bin"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_pack_sequences_rank_is_a_permutation(spark):
    rows = _doc_rows({i: "a b c" for i in range(128)})
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    ranks = [r.shuffle_rank for r in pack_sequences(docs).collect()]
    assert sorted(ranks) == list(range(1, 129))


def test_pack_sequences_no_full_corpus_global_window(spark):
    """The corpus-wide window must partition by bucket; the only
    unpartitioned window may run over the 256-row bucket totals."""
    rows = _doc_rows({i: "a b" for i in range(64)})
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    plan = pack_sequences(docs)._jdf.queryExecution().optimizedPlan().toString()
    windows = [ln for ln in plan.split("\n") if "Window" in ln]
    corpus_windows = [ln for ln in windows if "_local_" in ln or "_h" in ln]
    assert corpus_windows, plan
    for ln in corpus_windows:
        assert "partitionby" in ln.lower() or "_b" in ln, ln


def test_decontaminate_copy_flagged_disjoint_clean(spark):
    train_ids = [i for i in range(200) if _split_of(i) == "train"]
    test_ids = [i for i in range(200) if _split_of(i) == "test"]
    assert len(train_ids) > 5 and len(test_ids) >= 2
    copied, clean = test_ids[0], test_ids[1]
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs_map = {train_ids[0]: text}
    docs_map[copied] = text  # verbatim copy of a train doc
    docs_map[clean] = "qq ww ee rr tt yy uu ii"  # disjoint vocabulary
    docs = spark.createDataFrame(_doc_rows(docs_map), DOCS_SCHEMA)
    got = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert set(got) == {copied, clean}
    assert got[copied].contamination_frac == 1.0
    assert got[copied].is_contaminated is True
    assert got[clean].n_contaminated == 0
    assert got[clean].contamination_frac == 0.0
    assert got[clean].is_contaminated is False


def test_decontaminate_bloom_identical_and_prunes(spark, sf_dir):
    """The bloom-prefiltered form must return the bit-identical result
    on the real harness corpus (bloom negatives are definite — only the
    join INPUT shrinks), and the prune must actually bite: >10x fewer
    test shingles reach the exact join than the unfiltered form sends."""
    from pyspark.sql import functions as F

    from spot_anomalies_flink_workshop_resources_spark.operators.contamination import (
        _shingles,
        _split_expr,
        bloom_build,
        bloom_mark,
        decontaminate_bloom,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = sorted(tuple(r) for r in decontaminate(docs).collect())
    got = sorted(tuple(r) for r in decontaminate_bloom(docs).collect())
    assert got == want

    # measure what the prefilter prunes: every true hit must survive
    # (no false negatives) and nearly every true miss must be dropped
    # (the harness corpus overlaps ~50%, so the interesting number is
    # the false-positive rate on the miss side, not the gross ratio)
    sh = _shingles(docs, 3).withColumn("_split", _split_expr(F.col("doc_id")))
    train_toks = sh.where(F.col("_split") == "train").select("tok").distinct()
    test_sh = sh.where(F.col("_split") == "test").select("doc_id", "tok")
    bloom = bloom_build(train_toks)
    marked = bloom_mark(test_sh, bloom)
    total = marked.count()
    survivors = marked.where(F.col("bloom_maybe")).count()
    true_hits = test_sh.join(train_toks, "tok", "semi").count()
    assert total > 1000, total
    assert survivors >= true_hits  # no false negatives
    misses = total - true_hits
    false_pos = survivors - true_hits
    assert false_pos <= max(5, 0.02 * misses), (false_pos, misses)


def test_decontaminate_bloom_join_input_drops_10x_on_novel_corpus(spark):
    """On a corpus whose test split is mostly novel text — the shape a
    real pre-release decontamination run has — the bloom cuts the exact
    join's input >10x."""
    from pyspark.sql import functions as F

    from spot_anomalies_flink_workshop_resources_spark.operators.contamination import (
        _shingles,
        _split_expr,
        bloom_build,
        bloom_mark,
        decontaminate,
        decontaminate_bloom,
    )

    train_ids = [i for i in range(400) if _split_of(i) == "train"]
    test_ids = [i for i in range(400) if _split_of(i) == "test"]
    docs_map = {}
    for j, i in enumerate(train_ids[:20]):
        docs_map[i] = " ".join(f"tr{j}w{k}" for k in range(30))
    for j, i in enumerate(test_ids[:16]):
        # one contaminated doc, the rest novel vocabulary
        if j == 0:
            docs_map[i] = docs_map[train_ids[0]]
        else:
            docs_map[i] = " ".join(f"te{j}w{k}" for k in range(30))
    docs = spark.createDataFrame(_doc_rows(docs_map), DOCS_SCHEMA)

    want = sorted(tuple(r) for r in decontaminate(docs).collect())
    got = sorted(tuple(r) for r in decontaminate_bloom(docs).collect())
    assert got == want

    sh = _shingles(docs, 3).withColumn("_split", _split_expr(F.col("doc_id")))
    train_toks = sh.where(F.col("_split") == "train").select("tok").distinct()
    test_sh = sh.where(F.col("_split") == "test").select("doc_id", "tok")
    marked = bloom_mark(test_sh, bloom_build(train_toks))
    total = marked.count()
    survivors = marked.where(F.col("bloom_maybe")).count()
    assert survivors * 10 < total, (survivors, total)


def test_decontaminate_partial_overlap_fraction(spark):
    train_ids = [i for i in range(200) if _split_of(i) == "train"]
    test_ids = [i for i in range(200) if _split_of(i) == "test"]
    # test doc: first half shares train trigrams, second half is novel
    docs_map = {
        train_ids[0]: "a b c d e",
        test_ids[0]: "a b c d e n1 n2 n3 n4 n5",
    }
    docs = spark.createDataFrame(_doc_rows(docs_map), DOCS_SCHEMA)
    row = decontaminate(docs).first()
    # trigrams of the test doc: 8 distinct; 'a b c','b c d','c d e' hit
    assert row.n_shingles == 8
    assert row.n_contaminated == 3
    assert row.contamination_frac == pytest.approx(3 / 8)
