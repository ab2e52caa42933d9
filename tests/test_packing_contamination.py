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
