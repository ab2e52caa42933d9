"""Unit tests for operators/quality.py (repetition, PII, sampling,
mixture weights) on crafted fixtures with hand-computed expectations.
The cross-engine value equality is covered by the DuckDB oracles
(text_repetition_stats / text_pii_redact / corpus_sample_stratified /
corpus_mixture_weights); these tests pin the SEMANTICS."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.operators import quality as Q

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "s0", len(t)) for i, (t, lang) in enumerate(rows)],
        DOCS_SCHEMA,
    )


def test_repetition_stats_hand_computed(spark):
    docs = _docs(spark, [("a b a c a b", "en"), ("x y z", "en"), ("w", "en")])
    got = {r.doc_id: r for r in Q.repetition_stats(docs).collect()}

    r0 = got[0]  # words a,b,a,c,a,b -> distinct a,b,c
    assert r0.n_words == 6
    assert r0.frac_unique_words == pytest.approx(3 / 6)
    # dup words: a(3 occ x 1 char) + b(2 x 1) = 5 of 6 word chars
    assert r0.dup_word_chars_frac == pytest.approx(5 / 6)
    # grams: 'a b','b a','a c','c a','a b' -> 'a b' twice: 6 of 15 chars
    assert r0.dup_2gram_chars_frac == pytest.approx(6 / 15)

    r1 = got[1]  # all unique
    assert r1.frac_unique_words == 1.0
    assert r1.dup_word_chars_frac == 0.0
    assert r1.dup_2gram_chars_frac == 0.0
    assert r1.keep_doc is True

    r2 = got[2]  # single word: no 2-grams, guard path
    assert r2.n_words == 1
    assert r2.dup_2gram_chars_frac == 0.0


def test_repetition_keep_flag_rejects_degenerate_doc(spark):
    degenerate = " ".join(["spam"] * 50)
    docs = _docs(spark, [(degenerate, "en")])
    row = Q.repetition_stats(docs).first()
    assert row.frac_unique_words == pytest.approx(1 / 50)
    assert row.dup_word_chars_frac == 1.0
    assert row.keep_doc is False


def test_pii_redact_counts_and_digest_change(spark):
    docs = _docs(
        spark,
        [
            ("reach me at bob@corp.example.com or 10.1.2.3 ok", "en"),
            ("clean text only", "en"),
        ],
    )
    got = {r.doc_id: r for r in Q.pii_redact(docs).collect()}
    # doc 0: its own email+ip PLUS the synthetic seed (doc_id % 7 == 0)
    assert got[0].n_emails == 2
    assert got[0].n_ips == 2
    # doc 1: clean, no seed
    assert got[1].n_emails == 0
    assert got[1].n_ips == 0
    # redaction changed the text for doc 0 only
    raw_md5 = {
        r.doc_id: r.m
        for r in docs.select("doc_id", F.md5("text").alias("m")).collect()
    }
    assert got[0].redacted_md5 != raw_md5[0]
    assert got[1].redacted_md5 == raw_md5[1]


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    rows = [(f"doc {i} text", ["en", "zh"][i % 2]) for i in range(400)]
    docs = _docs(spark, rows)
    rates = {"en": 0.3, "zh": 1.0}
    s1 = Q.stratified_sample(docs, rates)
    s2 = Q.stratified_sample(docs.repartition(7), rates)
    ids1 = sorted(r.doc_id for r in s1.collect())
    ids2 = sorted(r.doc_id for r in s2.collect())
    assert ids1 == ids2  # membership survives reshuffles
    by_lang = {
        r.lang: r.n
        for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["zh"] == 200  # rate 1.0 keeps everything
    assert 20 <= by_lang.get("en", 0) <= 100  # ~60 expected at rate 0.3


def test_mixture_weights_sum_to_one_and_flatten(spark):
    docs = _docs(
        spark,
        [("one two three four five six seven eight", "en")] * 8
        + [("uno dos", "es")] * 2,
    )
    rows = {r.lang: r for r in Q.mixture_weights(docs).collect()}
    assert rows["en"].n_docs == 8 and rows["es"].n_docs == 2
    total_share = sum(r.token_share for r in rows.values())
    total_weight = sum(r.mix_weight for r in rows.values())
    assert total_share == pytest.approx(1.0)
    assert total_weight == pytest.approx(1.0)
    # sqrt temperature flattens: head loses share, tail gains
    assert rows["en"].mix_weight < rows["en"].token_share
    assert rows["es"].mix_weight > rows["es"].token_share


def test_mixture_weights_rejects_non_sqrt_alpha(spark):
    docs = _docs(spark, [("a", "en")])
    with pytest.raises(ValueError):
        Q.mixture_weights(docs, alpha=0.7)


def test_weighted_sample_key_formula_and_exact_k(spark):
    import hashlib
    import math

    from pyspark.sql import Row

    from spot_anomalies_flink_workshop_resources_spark.operators.quality import (
        weighted_sample,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text="x", lang="en", source="s", n_chars=w)
            for i, w in [(0, 1), (1, 10), (2, 100), (3, 1000)]
        ]
    )
    out = {r.doc_id: r for r in weighted_sample(docs, k=3).collect()}
    # exact k
    assert len(out) == 3
    # key formula matches an independent Python derivation
    for doc_id, r in out.items():
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / float(16 ** 13)
        expect = math.log(u) / {0: 1, 1: 10, 2: 100, 3: 1000}[doc_id]
        assert abs(r.lkey - expect) < 1e-15
    # the dropped doc is the one with the smallest key
    all_keys = {}
    for doc_id, w in [(0, 1), (1, 10), (2, 100), (3, 1000)]:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
        all_keys[doc_id] = math.log((h + 0.5) / float(16 ** 13)) / w
    dropped = min(all_keys, key=all_keys.get)
    assert dropped not in out


def test_gopher_rules_hand_computed(spark):
    # doc0: 40 tokens, the+a+of stopwords, varied words -> passes all
    # doc1: 10 tokens -> fails word_count; no stopwords -> fails stopwords
    # doc2: 'zz' * 40 -> fails repetition (one token is 100%); len-2
    #       words -> fails mean_word_len
    good = ("the quick brown fox jumps over a lazy dog of note " * 4).strip()
    short = "one two three four five six seven eight nine ten"
    reps = " ".join(["zz"] * 40)
    docs = _docs(spark, [(good, "en"), (short, "en"), (reps, "en")])
    got = {
        (r.source, r.rule): (r.n_pass, r.n_fail)
        for r in Q.gopher_rules(docs).collect()
    }
    assert got[("s0", "word_count")] == (2, 1)      # doc1 has 10 < 30
    assert got[("s0", "stopwords")] == (1, 2)       # only doc0 has >= 2
    assert got[("s0", "repetition")] == (2, 1)      # doc2 top token 100%
    # mean lens: doc0 39/11=3.55, doc1 3.9, doc2 2.0 — all below 4
    assert got[("s0", "mean_word_len")] == (0, 3)
    assert got[("s0", "alpha_ratio")] == (3, 0)     # all alphabetic


def test_gopher_mean_word_len_passes_longer_words(spark):
    text = " ".join(["wonderful", "elephant", "investigate"] * 12)
    docs = _docs(spark, [(text, "en")])
    got = {r.rule: r.n_pass for r in Q.gopher_rules(docs).collect()}
    assert got["mean_word_len"] == 1
    assert got["word_count"] == 1


def test_gopher_rules_empty_doc_fails_all(spark):
    docs = _docs(spark, [("", "en")])
    got = {r.rule: r.n_fail for r in Q.gopher_rules(docs).collect()}
    assert got == {
        "word_count": 1,
        "mean_word_len": 1,
        "stopwords": 1,
        "repetition": 1,
        "alpha_ratio": 1,
    }


def test_gate_overlap_counts_all_four_cells(spark, tmp_path):
    """Craft docs so every (q_pass, is_dup) cell is non-empty and the
    counts match a hand recount. Quality gate: stopword-rich, 100-2000
    chars => pass."""
    from spot_anomalies_flink_workshop_resources_spark.plans.pipeline_ops import (
        corpus_gate_overlap,
    )

    good = ("the data of the table is in the scan and the filter " * 4).strip()
    bad = "zz qq xx"
    rows = [
        (0, good, "en", "s0", len(good)),         # q_pass, keeper
        (1, good, "en", "s0", len(good)),         # q_pass, dup of 0
        (2, bad, "en", "s0", len(bad)),           # q_fail, keeper
        (3, bad, "en", "s0", len(bad)),           # q_fail, dup of 2
        (4, bad + " extra", "en", "s0", 11),      # q_fail, unique
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.q_pass, r.is_dup): (r.n, r.share)
        for r in corpus_gate_overlap(spark, str(tmp_path)).collect()
    }
    assert got[(True, False)] == (1, 0.2)
    assert got[(True, True)] == (1, 0.2)
    assert got[(False, False)] == (2, 0.4)
    assert got[(False, True)] == (1, 0.2)
