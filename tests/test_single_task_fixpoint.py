"""Round-10 optimization: the single-task fixpoint fast paths must be
bit-identical to the distributed round implementations they shortcut
(operators/graph.py pagerank/hits, operators/dedup.py component
resolvers). Each test runs BOTH physical shapes over the same crafted
graph and compares exact rows — the distributed arm is forced via the
``single_task`` parameter (graph) or by shrinking the edge-count
threshold (dedup), so both code paths stay covered even though the auto
threshold always picks single-task at test scale."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from spot_anomalies_flink_workshop_resources_spark.operators import dedup
from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
    hits,
    pagerank,
)


def _edges(spark, triples):
    return spark.createDataFrame(
        [Row(src=s, dst=d, w=w) for s, d, w in triples]
    )


GRAPH = [
    ("a", "hub", 3), ("b", "hub", 1), ("c", "hub", 2), ("hub", "a", 1),
    ("a", "b", 5), ("c", "a", 1), ("d", "a", 2),  # e dangles via dst-only
    ("d", "e", 1),
]


def test_pagerank_single_task_matches_rounds(spark):
    e = _edges(spark, GRAPH)
    fast = {r.node: r.rank for r in pagerank(
        e, iters=5, single_task=True).collect()}
    slow = {r.node: r.rank for r in pagerank(
        e, iters=5, single_task=False).collect()}
    assert fast == slow  # exact float equality: same int64 grid


def test_pagerank_single_task_matches_rounds_damping_one(spark):
    # the markov-stationary configuration: damping=1.0, zero teleport
    e = _edges(spark, GRAPH)
    fast = {r.node: r.rank for r in pagerank(
        e, iters=8, damping=1.0, single_task=True).collect()}
    slow = {r.node: r.rank for r in pagerank(
        e, iters=8, damping=1.0, single_task=False).collect()}
    assert fast == slow


def test_hits_single_task_matches_rounds(spark):
    e = _edges(spark, GRAPH)
    fast = {r.node: (r.authority, r.hub) for r in hits(
        e, iters=5, single_task=True).collect()}
    slow = {r.node: (r.authority, r.hub) for r in hits(
        e, iters=5, single_task=False).collect()}
    assert fast == slow


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in pairs]
    )


def _nodes(spark, ids):
    return spark.createDataFrame([Row(doc_id=i) for i in ids])


def _resolve(df):
    return {
        (r.doc_id, r.component_rep, r.is_kept) for r in df.collect()
    }


def test_bounded_components_single_task_matches_rounds(spark, monkeypatch):
    # chain 1-2-3-4-5 (diameter 4 > 3 rounds: truncation must match
    # EXACTLY, proving the numpy rounds replicate the distributed
    # truncation, not just the fixpoint), plus isolated 99
    nodes = _nodes(spark, [1, 2, 3, 4, 5, 99])
    chain = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    fast = _resolve(
        dedup.bounded_components_from_pairs(nodes, chain, rounds=3)
    )
    monkeypatch.setattr(dedup, "_MAX_SINGLE_TASK_EDGES", -1)
    slow = _resolve(
        dedup.bounded_components_from_pairs(nodes, chain, rounds=3)
    )
    assert fast == slow
    assert (99, 99, True) in fast


def test_fixpoint_components_single_task_matches_rounds(spark, monkeypatch):
    # ring + two-pair component + isolated node: fixpoint labels equal
    # min reachable id under both physical shapes
    nodes = _nodes(spark, list(range(1, 11)))
    ring = _pairs(
        spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (7, 8), (8, 9)]
    )
    fast = _resolve(dedup.components_from_pairs(nodes, ring))
    monkeypatch.setattr(dedup, "_MAX_SINGLE_TASK_EDGES", -1)
    slow = _resolve(dedup.components_from_pairs(nodes, ring))
    assert fast == slow
    assert (5, 1, False) in fast and (9, 7, False) in fast
    assert (6, 6, True) in fast


def test_single_task_convergence_raises_stay_driver_side(spark):
    # refuse-to-lie contract: the single-task path must still raise a
    # plain RuntimeError at BUILD time (not a wrapped task failure)
    nodes = _nodes(spark, list(range(1, 11)))
    chain = _pairs(spark, [(i, i + 1) for i in range(1, 10)])
    with pytest.raises(RuntimeError, match="fixpoint"):
        dedup.components_from_pairs(nodes, chain, max_rounds=2)
    with pytest.raises(RuntimeError, match="still moving"):
        dedup.bounded_components_from_pairs(
            nodes, chain, rounds=4, verify_converged=True
        )
