"""Randomized cross-checks for the second-wave operators: each query
re-derived by an independent pure-Python reference on seeded random
fixtures — the multi-seed strategy the statistics family uses.  These
catch formula / boundary / tie bugs that a single hand example cannot.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.plans import insights as I

from test_insights import _events, _write


def _rand_events(seed, n_days=14, types=("a", "b"), users=(1, 2, 3)):
    rng = random.Random(seed)
    rows, i = [], 0
    for d in range(1, n_days + 1):
        for t in types:
            for _ in range(rng.randint(0, 6)):
                h, m, sec = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
                rows.append(
                    (i, f"2024-03-{d:02d} {h:02d}:{m:02d}:{sec:02d}",
                     rng.choice(users), t, round(rng.uniform(1, 99), 2))
                )
                i += 1
    return rows


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_skyline_matches_bruteforce(spark, tmp_path, seed):
    rng = random.Random(seed)
    pts = [(k, rng.randint(1, 12), round(rng.uniform(1, 20), 2))
           for k in range(1, 41)]
    df = spark.createDataFrame(
        [Row(p_partkey=k, p_name="x", p_brand="B", p_type="t", p_size=sz,
             p_retailprice=pr) for k, sz, pr in pts]
    )
    _write(df, tmp_path, "part")
    got = sorted(r.p_partkey for r in
                 I.sql_part_skyline(spark, str(tmp_path)).collect())
    cents = {k: round(pr * 100) for k, _, pr in pts}
    want = []
    for k, sz, pr in pts:
        dominated = any(
            qsz >= sz and cents[qk] <= cents[k]
            and (qsz > sz or cents[qk] < cents[k])
            for qk, qsz, _ in pts if qk != k
        )
        if not dominated:
            want.append(k)
    assert got == sorted(want)


@pytest.mark.parametrize("seed", [5, 17])
def test_weighted_median_matches_reference(spark, tmp_path, seed):
    rng = random.Random(seed)
    li, part = [], [Row(p_partkey=1, p_name="x", p_brand="B", p_type="t",
                        p_size=1, p_retailprice=1.0)]
    data = [(rng.randint(1, 9), round(rng.uniform(0.5, 50), 2))
            for _ in range(60)]
    for i, (q, w) in enumerate(data):
        li.append(Row(l_orderkey=i, l_partkey=1, l_quantity=float(q),
                      l_extendedprice=w))
    _write(spark.createDataFrame(part), tmp_path, "part")
    _write(spark.createDataFrame(li), tmp_path, "lineitem")
    r = I.sql_weighted_median(spark, str(tmp_path)).collect()[0]
    # reference: smallest qty with 2*cumweight >= total (cents grid)
    grid = {}
    for q, w in data:
        grid[q * 100] = grid.get(q * 100, 0) + round(w * 100)
    tot = sum(grid.values())
    cum = 0
    for qc in sorted(grid):
        cum += grid[qc]
        if 2 * cum >= tot:
            want = qc / 100.0
            break
    assert r.w_median_qty == want and r.total_weight_cents == tot


@pytest.mark.parametrize("seed", [3, 29])
def test_quantile_interp_matches_numpy_random(spark, tmp_path, seed):
    import numpy as np

    rng = random.Random(seed)
    # integer-cent values incl. ties — numpy agrees exactly on this grid
    vals = [round(rng.uniform(1, 30), 2) for _ in range(rng.randint(7, 40))]
    rows = [(i, "2024-03-01 10:00:00", 1, "q", v) for i, v in enumerate(vals)]
    sf = _events(spark, tmp_path, rows)
    got = {r.decile: r.value for r in
           I.events_quantile_interp(spark, sf).collect()}
    cents = sorted(round(v * 100) for v in vals)
    for k in range(11):
        want = float(np.quantile(cents, k / 10)) / 100.0
        assert got[k] == pytest.approx(want, abs=1e-9), (k, vals)


@pytest.mark.parametrize("seed", [7, 31])
def test_session_coverage_matches_sweepline(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, i = [], 0
    stamps = {}
    for u in (1, 2):
        ts = []
        t = 0
        for _ in range(25):
            t += rng.randint(1, 700)
            ts.append(t)
        stamps[u] = ts
        for t in ts:
            h, m, s2 = t // 3600, (t % 3600) // 60, t % 60
            rows.append((i, f"2024-03-01 {h:02d}:{m:02d}:{s2:02d}", u, "c", 1.0))
            i += 1
    sf = _events(spark, tmp_path, rows)
    got = {r.user_id: r for r in
           I.events_session_coverage(spark, sf).collect()}
    for u, ts in stamps.items():
        ts = sorted(ts)
        bursts, covered = 1, 0
        lo = ts[0]
        prev = ts[0]
        for t in ts[1:]:
            if t - prev > 300:
                covered += prev - lo + 300
                bursts += 1
                lo = t
            prev = t
        covered += prev - lo + 300
        r = got[u]
        assert r.n_bursts == bursts and r.covered_seconds == covered
        assert r.span_seconds == ts[-1] - ts[0] + 300


@pytest.mark.parametrize("seed", [13, 37])
def test_spc_matches_numpy_reference(spark, tmp_path, seed):
    rows = _rand_events(seed)
    sf = _events(spark, tmp_path, rows)
    got = I.events_spc_control(spark, sf).collect()
    # python reference per type
    from collections import defaultdict

    daily = defaultdict(lambda: defaultdict(int))
    for (_i, ts, _u, t, _v) in rows:
        daily[t][ts[:10]] += 1
    for r in got:
        counts = sorted(daily[r.event_type].values())
        n, s = len(counts), sum(counts)
        q = sum(c * c for c in counts)
        dev = n * r.cnt - s
        assert r.beyond_3sigma == (dev * dev > 9 * (n * q - s * s))


@pytest.mark.parametrize("seed", [19, 41])
def test_ccf_matches_numpy(spark, tmp_path, seed):
    import numpy as np

    rng = random.Random(seed)
    n_days = 12
    a = [rng.randint(1, 8) for _ in range(n_days)]
    b = [rng.randint(1, 8) for _ in range(n_days)]
    rows, i = [], 0
    for d in range(n_days):
        for _ in range(a[d]):
            rows.append((i, f"2024-03-{d+1:02d} 01:00:00", 1, "click", 1.0)); i += 1
        for _ in range(b[d]):
            rows.append((i, f"2024-03-{d+1:02d} 02:00:00", 1, "purchase", 1.0)); i += 1
    sf = _events(spark, tmp_path, rows)
    got = {r.lag: r.ccf for r in I.events_ccf(spark, sf).collect()}
    for lag in range(-7, 8):
        if lag >= 0:
            xs, ys = a[: n_days - lag], b[lag:]
        else:
            xs, ys = a[-lag:], b[: n_days + lag]
        want = float(np.corrcoef(xs, ys)[0, 1]) if len(xs) > 1 else None
        if want is None or math.isnan(want):
            assert got[lag] is None or abs(got[lag]) <= 1.0
        else:
            assert got[lag] == pytest.approx(want, abs=1e-9), lag


@pytest.mark.parametrize("seed", [2, 43])
def test_croston_matches_python_fold(spark, tmp_path, seed):
    rng = random.Random(seed)
    demand_days = sorted(rng.sample(range(1, 28), rng.randint(4, 9)))
    sizes = {d: rng.randint(1, 5) for d in demand_days}
    rows, i = [], 0
    for d, sz in sizes.items():
        for _ in range(sz):
            rows.append((i, f"2024-03-{d:02d} 10:00:00", 1, "x", 50.0)); i += 1
    sf = _events(spark, tmp_path, rows)
    r = I.events_croston(spark, sf).collect()[0]
    z = x = None
    prev = None
    for d in demand_days:
        dem = float(sizes[d])
        gap = 1.0 if prev is None else float(d - prev)
        if z is None:
            z, x = dem, gap
        else:
            z = z + 0.125 * (dem - z)
            x = x + 0.125 * (gap - x)
        prev = d
    assert r.smoothed_size == z and r.smoothed_interval == x
    assert r.demand_per_day == z / x


@pytest.mark.parametrize("seed", [53, 59])
def test_fano_matches_reference(spark, tmp_path, seed):
    rows = _rand_events(seed, n_days=3)
    sf = _events(spark, tmp_path, rows)
    from collections import defaultdict

    hourly = defaultdict(lambda: defaultdict(int))
    all_hours = set()
    for (_i, ts, _u, t, _v) in rows:
        h = ts[:13]
        hourly[t][h] += 1
        all_hours.add(h)
    got = {r.event_type: r for r in I.events_fano(spark, sf).collect()}
    # global span from min/max hour of ALL events
    hours = sorted(all_hours)
    import datetime as dt

    h0 = dt.datetime.strptime(hours[0], "%Y-%m-%d %H")
    h1 = dt.datetime.strptime(hours[-1], "%Y-%m-%d %H")
    n = int((h1 - h0).total_seconds() // 3600) + 1
    for t, r in got.items():
        counts = list(hourly[t].values())
        s = sum(counts)
        q = sum(c * c for c in counts)
        assert r.n_hours == n
        assert r.overdispersed == (n * q - s * s > (n - 1) * s)
        if s:
            assert r.fano == pytest.approx(
                (n * q - s * s) / ((n - 1) * s), rel=1e-12
            )


@pytest.mark.parametrize("seed", [61, 67])
def test_linkpred_matches_python_reference(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, orders = [], []
    for o in range(1, 25):
        basket = rng.sample(range(1, 9), rng.randint(2, 4))
        orders.append(set(basket))
        for pk in basket:
            rows.append(Row(l_orderkey=o, l_partkey=pk, l_quantity=1.0,
                            l_extendedprice=1.0))
    _write(spark.createDataFrame(rows), tmp_path, "lineitem")
    got = {(r.node_a, r.node_b): r for r in
           I.sql_copurchase_linkpred(spark, str(tmp_path)).collect()}
    # python reference
    from collections import defaultdict

    support = defaultdict(int)
    for basket in orders:
        bs = sorted(basket)
        for i in range(len(bs)):
            for j2 in range(i + 1, len(bs)):
                support[(bs[i], bs[j2])] += 1
    edges = {p for p, c in support.items() if c >= 2}
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    scale = float(1 << 20)
    want = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in edges:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            aa_q = sum(math.floor(scale / math.log(len(adj[z])) + 0.5)
                       for z in common)
            want[(a, b)] = (len(common), aa_q / scale,
                            len(common) / (len(adj[a]) + len(adj[b])
                                           - len(common)))
    if len(want) <= 50:
        assert set(got) == set(want), (set(got), set(want))
    for k, (cn, aa, jac) in want.items():
        if k in got:
            assert got[k].common_neighbors == cn
            assert got[k].adamic_adar == pytest.approx(aa, rel=1e-12)
            assert got[k].jaccard == pytest.approx(jac, rel=1e-12)


@pytest.mark.parametrize("seed", [71, 73])
def test_winsorized_mean_matches_python(spark, tmp_path, seed):
    rng = random.Random(seed)
    vals = [round(rng.uniform(0.5, 200), 2) for _ in range(rng.randint(20, 80))]
    rows = [(i, "2024-03-01 10:00:00", 1, "w", v) for i, v in enumerate(vals)]
    sf = _events(spark, tmp_path, rows)
    r = I.events_winsorized_mean(spark, sf).collect()[0]
    cents = sorted(round(v * 100) for v in vals)
    n = len(cents)
    k_lo = math.ceil(0.05 * n)
    k_hi = math.ceil(0.95 * n)
    lo, hi = cents[k_lo - 1], cents[k_hi - 1]
    clamped = [min(max(c, lo), hi) for c in cents]
    assert r.p5_value == lo / 100 and r.p95_value == hi / 100
    assert r.winsorized_mean == pytest.approx(
        sum(clamped) / n / 100, rel=1e-12
    )


@pytest.mark.parametrize("seed", [79, 83])
def test_psi_matches_python(spark, tmp_path, seed):
    rows = _rand_events(seed, n_days=10, types=("t",))
    sf = _events(spark, tmp_path, rows)
    r = I.events_psi_drift(spark, sf).collect()[0]
    cents = [(round(v * 100), int(ts[8:10])) for (_i, ts, _u, _t, v) in rows]
    days = [d for _c, d in cents]
    md = (min(days) + max(days) + 1) // 2
    mn = min(c for c, _d in cents)
    mx = max(c for c, _d in cents)
    from collections import Counter

    cp, cq = Counter(), Counter()
    for c, d in cents:
        b = ((c - mn) * 10) // (mx - mn + 1)
        (cp if d < md else cq)[b] += 1
    scale = float(1 << 20)
    tp = sum(cp.values()) + 10
    tq = sum(cq.values()) + 10
    total = 0
    for b in range(10):
        p = (cp.get(b, 0) + 1) / tp
        q = (cq.get(b, 0) + 1) / tq
        total += math.floor((p - q) * math.log(p / q) * scale + 0.5)
    assert r.psi == total / scale
    assert r.drifted == (total > (1 << 20) // 10)


@pytest.mark.parametrize("seed", [89, 97])
def test_silence_gaps_match_python(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, i = [], 0
    stamps = []
    t = 0
    for _ in range(40):
        t += rng.randint(1, 4000)
        stamps.append(t)
        h, m, s2 = t // 3600, (t % 3600) // 60, t % 60
        rows.append((i, f"2024-03-01 {h:02d}:{m:02d}:{s2:02d}", 1, "f", 1.0))
        i += 1
    sf = _events(spark, tmp_path, rows)
    got = I.events_silence_gaps(spark, sf).collect()
    import datetime as dt

    base = int(dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc).timestamp())
    stamps = sorted(base + t for t in stamps)
    gaps = sorted(
        ((b - a, a) for a, b in zip(stamps, stamps[1:])),
        key=lambda g: (-g[0], g[1]),
    )
    span = stamps[-1] - stamps[0]
    n_gaps = len(stamps) - 1
    for rk, (g, start) in enumerate(gaps[:5], start=1):
        row = got[rk - 1]
        assert (row.rank, row.gap_seconds, row.gap_start) == (rk, g, start)
        assert row.stalled == (g * n_gaps > 10 * span)


@pytest.mark.parametrize("seed", [101, 103])
def test_heaps_fit_matches_python_ols(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = []
    words = [f"w{j}" for j in range(50)]
    for did in range(1, 15):
        toks = [rng.choice(words) for _ in range(rng.randint(3, 60))]
        text = " ".join(toks)
        docs.append(Row(doc_id=did, text=text, lang="aa", source="s",
                        n_chars=len(text)))
    _write(spark.createDataFrame(docs), tmp_path, "documents")
    r = I.text_heaps_fit(spark, str(tmp_path)).collect()[0]
    pts = []
    for d in docs:
        toks = d.text.split()
        x = math.floor(math.log(len(toks)) * 1024 + 0.5)
        y = math.floor(math.log(len(set(t.lower() for t in toks))) * 1024 + 0.5)
        pts.append((x, y))
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    assert r.n_docs == n
    assert r.heaps_beta == pytest.approx(num / dx, rel=1e-12)
    assert r.r2 == pytest.approx(num * num / (dx * dy), rel=1e-12)
