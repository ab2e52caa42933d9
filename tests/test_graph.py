"""Weighted integer-exact PageRank (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


def _edges(spark, triples):
    return spark.createDataFrame(
        [Row(src=s, dst=d, w=w) for s, d, w in triples]
    )


def test_pagerank_hub_and_mass_conservation(spark):
    """A node every other node points to out-ranks the rest; total rank
    mass stays ~1 (exact up to the per-round rounding, bounded by
    |V|+|E| half-units per round); a dangling node's mass re-enters."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        pagerank,
    )

    e = _edges(
        spark,
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1),
         ("hub", "a", 1)],
    )
    got = {r.node: r.rank for r in pagerank(e, iters=5).collect()}
    assert set(got) == {"a", "b", "c", "hub"}
    assert got["hub"] == max(got.values())
    assert got["hub"] > got["b"] > 0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_dangling_node_redistributes(spark):
    """d has no out-edges: its mass must spread uniformly, not vanish —
    total stays ~1 and every node keeps rank above the bare teleport."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        pagerank,
    )

    e = _edges(spark, [("a", "b", 1), ("b", "d", 1)])
    got = {r.node: r.rank for r in pagerank(e, iters=5).collect()}
    assert set(got) == {"a", "b", "d"}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    teleport = 0.15 / 3
    assert all(v > teleport for v in got.values())


def test_pagerank_quantization_margin(spark, sf_dir):
    """The one float per (edge, round) is floor(d*r*w/wout + 0.5): a
    cross-engine flip needs the argument within ulps of an integer.
    Replays the engine rounds on the harness transition graph and
    measures the min distance to a rounding boundary."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spot_anomalies_flink_workshop_resources_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    nodes = sorted({r.src for r in edges} | {r.dst for r in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    wout = {}
    for r in edges:
        wout[r.src] = wout.get(r.src, 0) + r.w
    R = np.full(n, (1 << 30) // n, dtype=np.int64)
    teleport = int(0.15 / n * (1 << 30) + 0.5)
    min_gap = np.inf
    for _ in range(5):
        nxt = np.full(n, teleport, dtype=np.int64)
        for r in edges:
            x = 0.85 * float(R[idx[r.src]]) * float(r.w) / float(wout[r.src]) + 0.5
            min_gap = min(min_gap, abs(x - round(x)))
            nxt[idx[r.dst]] += int(np.floor(x))
        dr = sum(int(R[idx[m]]) for m in nodes if m not in wout)
        nxt += int(np.floor(0.85 * dr / n + 0.5))
        R = nxt
    assert min_gap > 1e-6, min_gap


def _tri_edges(spark, pairs):
    return spark.createDataFrame([Row(x=a, y=b) for a, b in pairs])


def test_triangles_k4(spark):
    """K4: 4 triangles total, every vertex in exactly 3."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        triangle_counts,
    )

    e = _tri_edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    )
    got = {r.node: r.n_tri for r in triangle_counts(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_star_has_none(spark):
    """A hub star has wedges but no triangles — and the degree
    orientation means the hub never enumerates its neighbor pairs."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        triangle_counts,
    )

    e = _tri_edges(spark, [(0, k) for k in range(1, 6)])
    assert triangle_counts(e).count() == 0


def test_triangles_pendant_excluded(spark):
    """Triangle + pendant edge: only the three cycle nodes count, each
    once; the pendant node is absent from the result."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        triangle_counts,
    )

    e = _tri_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 9)])
    got = {r.node: r.n_tri for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_shared_edge(spark):
    """Two triangles sharing an edge: shared-edge endpoints count 2."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        triangle_counts,
    )

    e = _tri_edges(
        spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    )
    got = {r.node: r.n_tri for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_kcore_path_empties_and_cycle_survives(spark):
    """A path has no 2-core; a cycle IS its own 2-core (all deg 2)."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import kcore

    path = _tri_edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert kcore(path, k=2).count() == 0
    cycle = _tri_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    got = {r.node: r.core_deg for r in kcore(cycle, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_kcore_peels_pendant_chain_iteratively(spark):
    """Triangle + a 3-node pendant chain: each round exposes the next
    chain node, so the peel takes multiple rounds to reach the core."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import kcore

    e = _tri_edges(
        spark, [(1, 2), (2, 3), (1, 3), (3, 10), (10, 11), (11, 12)]
    )
    got = {r.node: r.core_deg for r in kcore(e, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_k3_on_k4(spark):
    """K4 is a 3-core; adding a degree-2 tail changes nothing."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import kcore

    e = _tri_edges(
        spark,
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9), (9, 1)],
    )
    got = {r.node: r.core_deg for r in kcore(e, k=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def _py_triangles(pairs):
    import itertools

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _py_kcore(pairs, k):
    edges = set(pairs)
    while True:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            return deg
        edges = {(a, b) for a, b in edges if a not in bad and b not in bad}


def test_triangles_and_kcore_match_reference_on_random_graphs(spark):
    """Seeded Erdos-Renyi graphs vs brute-force Python references —
    the orientation/peel machinery can't silently drop or double-count
    on shapes the hand fixtures don't cover."""
    import itertools
    import random

    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        kcore,
        triangle_counts,
    )

    rng = random.Random(20260814)
    for trial in range(4):
        n = rng.randint(8, 22)
        p = rng.uniform(0.15, 0.45)
        pairs = [
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < p
        ]
        if not pairs:
            continue
        e = _tri_edges(spark, pairs)
        got_tri = {
            r.node: r.n_tri for r in triangle_counts(e).collect()
        }
        assert got_tri == _py_triangles(pairs), (trial, pairs)
        got_core = {r.node: r.core_deg for r in kcore(e, k=3).collect()}
        assert got_core == _py_kcore(pairs, 3), (trial, pairs)


def test_kcore_raises_when_bound_too_small(spark):
    """An insufficient max_rounds must FAIL LOUDLY (ADVICE r5): engine
    and oracle unroll the same round count, so silent nonconvergence
    would make them agree on wrong output. A 4-node pendant chain off
    a triangle needs 4 peel rounds; bound 2 must raise."""
    import pytest

    from spot_anomalies_flink_workshop_resources_spark.operators.graph import kcore

    e = _tri_edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (3, 10), (10, 11), (11, 12), (12, 13)],
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(e, k=2, max_rounds=2)
    # with enough rounds the same graph converges to the triangle
    got = {r.node: r.core_deg for r in kcore(e, k=2, max_rounds=8).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_label_propagation_two_triangles(spark):
    """Two disconnected triangles collapse to their min labels; the
    self-label tiebreak keeps a lone edge stable at its min node."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        label_propagation,
    )

    e = _tri_edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    got = {r.node: r.community for r in label_propagation(e, rounds=4).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10
    assert got[20] == got[21] == 20


def test_bfs_hops_path_and_bound(spark):
    """Path 0-1-2-...-8 seeded at nodes % 9 == 0 (0 only within the
    path, but 9 is absent): hop = node index, truncated at max_hops —
    truncation now requires the explicit verify_complete=False opt-out
    (round 7, VERDICT r6 #8)."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        bfs_hops,
    )

    e = _tri_edges(spark, [(i, i + 1) for i in range(8)])
    got = {
        r.node: r.hops
        for r in bfs_hops(
            e, seed_mod=9, max_hops=4, verify_complete=False
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}  # 5..8 beyond the bound


def test_bfs_hops_picks_nearest_seed(spark):
    """Two seeds (0 and 6): node 3 is 3 hops from both; node 5 is 1
    hop from seed 6, not 5 hops from seed 0."""
    from spot_anomalies_flink_workshop_resources_spark.operators.graph import (
        bfs_hops,
    )

    e = _tri_edges(spark, [(i, i + 1) for i in range(6)])
    got = {r.node: r.hops for r in bfs_hops(e, seed_mod=6, max_hops=6).collect()}
    assert got == {0: 0, 6: 0, 1: 1, 5: 1, 2: 2, 4: 2, 3: 3}


def test_modularity_contributions_consistent(spark, tmp_path):
    """Two triangles + one bridge: every row's contribution must equal
    (4m*e_in - d_tot^2)/(4m^2) recomputed from its own integer columns,
    the identity Σd_tot = 2m must hold, and Q must land in (0, 1) for
    this clearly-clustered graph."""
    import pyspark.sql.functions as F

    from spot_anomalies_flink_workshop_resources_spark.plans.stattests import (
        sql_copurchase_modularity,
    )

    # synthesize a lineitem table whose co-purchase graph IS the fixture:
    # orders 1..7 each carry one edge's two parts twice (support >= 2)
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    rows = []
    ok = 0
    for (a, b) in edges:
        for rep in range(2):  # support 2 so every edge survives
            ok += 1
            rows.append((ok, a))
            rows.append((ok, b))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = sql_copurchase_modularity(spark, str(tmp_path)).collect()
    m = 7
    total_d = sum(r.d_tot for r in out)
    assert total_d == 2 * m
    q = 0.0
    for r in out:
        expect = (4 * m * r.e_in - r.d_tot * r.d_tot) / float(4 * m * m)
        assert r.contribution == expect
        q += expect
    assert 0.0 < q < 1.0
