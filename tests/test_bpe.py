"""BPE vocabulary induction: the distributed trainer must reproduce a
pure-Python reference implementation (same greedy-leftmost rewrite,
same (count desc, pair asc) tiebreak) on crafted corpora. Cross-engine
pair statistics are covered by the corpus_bpe_pairs oracle."""

from __future__ import annotations

import re
from collections import Counter

from spot_anomalies_flink_workshop_resources_spark.operators.bpe import (
    bpe_encode,
    bpe_pair_counts,
    learn_merges,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)], DOCS_SCHEMA
    )


def _ref_bpe(texts, n_merges, min_count=2):
    """Reference BPE on the word-frequency dict: greedy leftmost
    non-overlapping rewrite, ties by lexicographic (left, right)."""
    vocab = Counter()
    for t in texts:
        vocab.update(re.findall("[a-z0-9]+", t.lower()))
    words = {w: [c for c in w] for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((rank, a, b, a + b, c))
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[w] = out
    return merges


def test_learn_merges_matches_reference(spark):
    texts = ["low low low low low", "lower lower", "newest " * 6, "widest " * 3]
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in learn_merges(_docs(spark, texts), n_merges=8).collect()
    ]
    assert got == _ref_bpe(texts, 8)
    assert len(got) >= 4  # es, est, lo, low... actually learned


def test_learn_merges_nonoverlapping_greedy(spark):
    # 'aaaa' x3: round 1 merges (a,a) -> [aa, aa]; the fold must not
    # chain-collapse to [aaa, a] or [aaaa]
    texts = ["aaaa aaaa aaaa"]
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in learn_merges(_docs(spark, texts), n_merges=2).collect()
    ]
    assert got == _ref_bpe(texts, 2)
    assert got[0][1:4] == ("a", "a", "aa")
    # round 2: pairs of [aa, aa] -> (aa, aa) with count 3
    assert got[1][1:4] == ("aa", "aa", "aaaa")


def _ref_encode(texts, merges):
    """Pure-Python encode: apply merges greedy-leftmost in rank order
    (the trainer's own folds) and count per-doc symbols."""
    rules = [(m[1], m[2], m[3]) for m in sorted(merges, key=lambda m: m[0])]
    out = {}
    for doc_id, t in enumerate(texts):
        toks = re.findall("[a-z0-9]+", t.lower())
        n_syms = 0
        for w in toks:
            syms = list(w)
            for a, b, ab in rules:
                folded = []
                for x in syms:
                    if folded and folded[-1] == a and x == b:
                        folded[-1] = ab
                    else:
                        folded.append(x)
                syms = folded
            n_syms += len(syms)
        if toks:
            out[doc_id] = (len(toks), n_syms)
    return out


def test_bpe_encode_matches_reference(spark):
    texts = ["low low low low low", "lower lower newest", "newest " * 6,
             "widest wide widest", "aaaa aaaa aa"]
    docs = _docs(spark, texts)
    merges = [tuple(r) for r in learn_merges(docs, n_merges=10).collect()]
    got = {
        r.doc_id: (r.n_tokens, r.n_bpe_tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    assert got == _ref_encode(texts, merges)
    # merges actually compress: fewer symbols than characters
    chars = {i: sum(len(w) for w in re.findall("[a-z0-9]+", t.lower()))
             for i, t in enumerate(texts)}
    assert all(got[i][1] < chars[i] for i in got)


def test_batched_merges_match_serial_on_fixtures(spark):
    """The batched trainer (max_batch>1) must emit the bit-identical
    merge table to serial (max_batch=1) training — the _select_batch
    disjointness/stop-cap rule guarantees it (VERDICT r3 #3)."""
    corpora = [
        ["low low low low low", "lower lower", "newest " * 6, "widest " * 3],
        ["aaaa aaaa aaaa"],  # self-pair: (aa,a)/(aa,aa) offspring caps
        ["xab xab xab xab xab", "zz zz zz"],  # new-pair (x,ab) outranks (z,z)
        ["afy afy afy afy afy", "de de de de de"],  # (af,y) lex-before (d,e)
        ["ab ab ab cd cd cd ef ef", "gh gh ij ij"],  # genuinely disjoint
    ]
    for texts in corpora:
        docs = _docs(spark, texts)
        serial = learn_merges(docs, n_merges=10, max_batch=1).collect()
        batched = learn_merges(docs, n_merges=10, max_batch=8).collect()
        assert [tuple(r) for r in batched] == [tuple(r) for r in serial], texts
        assert [tuple(r) for r in serial] == _ref_bpe(texts, 10), texts


def test_batched_merges_match_serial_randomized(spark):
    """Randomized corpora: batched == serial == pure-Python reference."""
    import random

    rng = random.Random(7)
    alphabet = "abcdef"
    for trial in range(4):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(12)
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 10)))
            for _ in range(6)
        ]
        docs = _docs(spark, texts)
        serial = [tuple(r) for r in learn_merges(docs, 12, max_batch=1).collect()]
        batched = [tuple(r) for r in learn_merges(docs, 12, max_batch=8).collect()]
        assert batched == serial, (trial, texts)
        assert serial == _ref_bpe(texts, 12), (trial, texts)


def _py_batched_bpe(texts, n_merges, max_batch):
    """Pure-Python twin of learn_merges' control flow: same snapshot
    ranking, same _select_batch, same greedy-leftmost fold — used to
    property-test the batch-selection rule against serial BPE without
    paying a Spark job per case."""
    from collections import namedtuple

    from spot_anomalies_flink_workshop_resources_spark.operators.bpe import (
        _select_batch,
    )

    RowT = namedtuple("RowT", "l r c")
    vocab = Counter()
    for t in texts:
        vocab.update(re.findall("[a-z0-9]+", t.lower()))
    words = {w: [ch for ch in w] for w in vocab}
    merges = []
    while len(merges) < n_merges:
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        rows = [
            RowT(l, r, c)
            for (l, r), c in sorted(
                pairs.items(), key=lambda kv: (-kv[1], kv[0])
            )
        ]
        cap = 4 * max_batch + 8
        truncated = len(rows) > cap
        rows = rows[:cap]
        if not rows or rows[0].c < 2:
            break
        batch = _select_batch(
            rows, min(max_batch, n_merges - len(merges)), truncated
        )
        rules = []
        for a, b, c in batch:
            merges.append((len(merges) + 1, a, b, a + b, c))
            rules.append((a, b, a + b))
        rule_map = {(a, b): ab for a, b, ab in rules}
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and (out[-1], x) in rule_map:
                    out[-1] = rule_map[(out[-1], x)]
                else:
                    out.append(x)
            words[w] = out
    return merges


def test_batched_selection_rule_property(spark):
    """Hypothesis stress of the exactness argument: on hundreds of
    random small corpora the batched control flow must emit the
    bit-identical merge table to serial BPE (pure-Python twins, no
    Spark jobs — the Spark fold itself is pinned by the fixture and
    randomized tests above)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words_st = st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=5),
        min_size=1,
        max_size=10,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        docs=st.lists(
            st.lists(words_st.flatmap(st.sampled_from), min_size=1, max_size=12),
            min_size=1,
            max_size=5,
        ),
        max_batch=st.integers(min_value=2, max_value=8),
    )
    def check(docs, max_batch):
        texts = [" ".join(ws) for ws in docs]
        got = _py_batched_bpe(texts, 12, max_batch)
        want = _ref_bpe(texts, 12)
        assert got == want, (texts, max_batch)

    check()


def test_batched_merges_reduce_rounds(spark):
    """A 64-merge run over a corpus with many disjoint frequent pairs
    must need >=5x fewer Spark rounds than one-merge-per-round."""
    # 16 words over disjoint char pairs, each (xy)^8 with descending
    # frequency: every word yields 4 stacked merges ((x,y), (xy,xy),
    # (xyxy,xyxy), (x8,x8)) = 64 total, and within a stage the pairs
    # are symbol-disjoint so batches stay full
    chars = "abcdefghijklmnopqrstuvwxyz012345"
    texts = [
        " ".join([(chars[2 * i] + chars[2 * i + 1]) * 8] * (50 - i))
        for i in range(16)
    ]
    stats: dict = {}
    got = learn_merges(_docs(spark, texts), n_merges=64, max_batch=8, stats=stats)
    rows = [(r.merge_rank, r.left, r.right, r.merged, r.pair_count) for r in got.collect()]
    assert rows == _ref_bpe(texts, 64)
    assert len(rows) == 64
    assert stats["rounds"] * 5 <= len(rows), stats


def test_pair_counts_rank_is_total_order(spark):
    texts = ["ab ab cd cd", "ab cd"]
    rows = bpe_pair_counts(_docs(spark, texts), top_k=10).collect()
    ranks = [r.merge_rank for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    keyed = [(-r.pair_count, r.pair) for r in rows]
    assert keyed == sorted(keyed)


def test_bpe_curve_monotone_and_prefix_consistent(spark, tmp_path):
    """symbols_per_token must be non-increasing in merge depth and
    >= 1.0 (a token is at least one symbol); depth-16 row must equal a
    direct 16-merge encode."""
    import pyspark.sql.functions as F

    from spot_anomalies_flink_workshop_resources_spark.plans import (
        pipeline_ops as P,
    )

    texts = ["the data table scans fast", "the data table joins slow",
             "fast scans beat slow joins", "the the the data data"] * 5
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = sorted(
        P.corpus_bpe_curve(spark, str(tmp_path)).collect(),
        key=lambda r: r.n_merges,
    )
    spts = [r.symbols_per_token for r in rows]
    assert [r.n_merges for r in rows] == [4, 8, 16]
    assert all(s >= 1.0 for s in spts)
    assert spts[0] >= spts[1] >= spts[2]
    enc16 = P.corpus_bpe_encode(spark, str(tmp_path)).agg(
        F.sum("n_bpe_tokens").alias("s"), F.sum("n_tokens").alias("n")
    ).collect()[0]
    assert rows[2].n_bpe_tokens == enc16.s and rows[2].n_tokens == enc16.n
