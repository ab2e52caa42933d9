"""ADVICE r10: the blocked-cosine switch (`_blocked_cosine_pairs`) had
no both-arms equivalence test — at test/bench scale every block is under
`_MAX_BLOCKED_PAIR_VECTORS`, so the distributed join+fold fallback in
embedding_near_dup/_ivf/_ivf_trained was dead code in CI. Mirror the
fixpoint tests: monkeypatch the cap to -1 to force the fallback and
assert exact row equality between both physical shapes, including the
null-block-key drop (the fallback's equi-join rejects nulls; the blocked
path must too)."""

from __future__ import annotations

from pyspark.sql import Row

from spot_anomalies_flink_workshop_resources_spark.operators import dedup


def _emb_rows():
    # two labelled blocks with near-dups, one orthogonal distractor,
    # and a NULL-label pair that would pair up if null keys formed a
    # block (the ADVICE divergence case)
    return [
        Row(vec_id=0, embedding=[1.0, 0.0], label=1),
        Row(vec_id=1, embedding=[1.0, 0.01], label=1),
        Row(vec_id=2, embedding=[0.0, 1.0], label=1),
        Row(vec_id=3, embedding=[1.0, 0.0], label=2),
        Row(vec_id=4, embedding=[1.0, 0.001], label=2),
        Row(vec_id=5, embedding=[1.0, 0.0], label=None),
        Row(vec_id=6, embedding=[1.0, 0.0], label=None),
    ]


def _rows(df):
    return sorted(
        (r.vec_a, r.vec_b, r[2], r.cosine) for r in df.collect()
    )


def test_near_dup_blocked_matches_join_fallback(spark, monkeypatch):
    df = spark.createDataFrame(_emb_rows())
    fast = _rows(dedup.embedding_near_dup(df, threshold=0.9))
    monkeypatch.setattr(dedup, "_MAX_BLOCKED_PAIR_VECTORS", -1)
    slow = _rows(dedup.embedding_near_dup(df, threshold=0.9))
    assert fast == slow  # exact: same IEEE fold order in both shapes
    assert fast  # non-vacuous
    # null-label vectors never pair in either shape
    assert all(a not in (5, 6) and b not in (5, 6) for a, b, _, _ in fast)


def test_ivf_blocked_matches_join_fallback(spark, monkeypatch):
    rows = [
        Row(vec_id=i, embedding=[1.0 + 0.001 * i, float(i % 2)], label=i % 3)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    fast = _rows(dedup.embedding_near_dup_ivf(df, threshold=0.9, n_centroids=2))
    monkeypatch.setattr(dedup, "_MAX_BLOCKED_PAIR_VECTORS", -1)
    slow = _rows(dedup.embedding_near_dup_ivf(df, threshold=0.9, n_centroids=2))
    assert fast == slow
    assert fast


def test_ivf_trained_blocked_matches_join_fallback(spark, monkeypatch):
    rows = [
        Row(vec_id=i, embedding=[1.0 + 0.001 * i, float(i % 3)], label=i % 3)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    kw = dict(threshold=0.9, n_centroids=2, max_iters=2, tol=0.0)
    fast = _rows(dedup.embedding_near_dup_ivf_trained(df, **kw))
    monkeypatch.setattr(dedup, "_MAX_BLOCKED_PAIR_VECTORS", -1)
    slow = _rows(dedup.embedding_near_dup_ivf_trained(df, **kw))
    assert fast == slow
    assert fast
