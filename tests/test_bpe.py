"""BPE vocabulary induction: the distributed trainer must reproduce a
pure-Python reference implementation (same greedy-leftmost rewrite,
same (count desc, pair asc) tiebreak) on crafted corpora. Cross-engine
pair statistics are covered by the corpus_bpe_pairs oracle."""

from __future__ import annotations

import re
from collections import Counter

from spot_anomalies_flink_workshop_resources_spark.operators.bpe import (
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


def test_pair_counts_rank_is_total_order(spark):
    texts = ["ab ab cd cd", "ab cd"]
    rows = bpe_pair_counts(_docs(spark, texts), top_k=10).collect()
    ranks = [r.merge_rank for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    keyed = [(-r.pair_count, r.pair) for r in rows]
    assert keyed == sorted(keyed)
