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
