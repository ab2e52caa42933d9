"""LOCF gap-fill semantics on hand-built sparse series."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from spot_anomalies_flink_workshop_resources_spark.operators.gapfill import (
    gapfill_locf,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=1,
                event_type=et,
                value=float(v),
                props="{}",
            )
            for i, (et, ts, v) in enumerate(rows)
        ]
    )


def test_gapfill_carries_last_value_and_flags_gaps(spark):
    h = lambda x: dt.datetime(2024, 1, 1, x, 30)  # noqa: E731
    df = _events(
        spark,
        [
            ("a", h(0), 10.0),
            ("a", h(0), 20.0),  # bucket 0: avg 15
            ("a", h(3), 40.0),  # buckets 1-2 are gaps
            ("b", h(2), 7.0),   # b starts at bucket 2: leading gaps
        ],
    )
    out = {
        (r.event_type, r.bucket.hour): r
        for r in gapfill_locf(df, granularity="hour").collect()
    }
    # dense grid: 2 types x 4 hourly buckets (range from bucketed min/max)
    assert len(out) == 8
    a0, a1, a2, a3 = (out[("a", i)] for i in range(4))
    assert (a0.n_events, a0.avg_value, a0.filled_value, a0.is_gap) == (
        2, 15.0, 15.0, False,
    )
    # gap rows: zero events, null raw avg, LOCF-filled, flagged
    assert (a1.n_events, a1.avg_value, a1.filled_value, a1.is_gap) == (
        0, None, 15.0, True,
    )
    assert a2.filled_value == 15.0 and a2.is_gap
    assert (a3.n_events, a3.filled_value, a3.is_gap) == (1, 40.0, False)
    # leading gaps before a key's first observation stay null
    b0, b1, b2, b3 = (out[("b", i)] for i in range(4))
    assert b0.is_gap and b0.filled_value is None
    assert b1.is_gap and b1.filled_value is None
    assert (b2.n_events, b2.filled_value, b2.is_gap) == (1, 7.0, False)
    assert b3.is_gap and b3.filled_value == 7.0


def test_gapfill_matches_python_reference_on_random_series(spark):
    """Random sparse series vs a pure-Python LOCF reference."""
    import random

    rng = random.Random(7)
    rows = []
    for et in ("a", "b", "c"):
        for _ in range(rng.randint(1, 10)):
            rows.append(
                (
                    et,
                    dt.datetime(2024, 1, 1, rng.randint(0, 23), rng.randint(0, 59)),
                    round(rng.uniform(0, 100), 4),
                )
            )
    df = _events(spark, rows)
    got = {
        (r.event_type, r.bucket): (r.n_events, r.filled_value, r.is_gap)
        for r in gapfill_locf(df, granularity="hour").collect()
    }

    # python reference
    buckets = {}
    for et, ts, v in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        buckets.setdefault((et, b), []).append(v)
    all_b = [b for (_, b) in buckets]
    lo, hi = min(all_b), max(all_b)
    spine = []
    cur = lo
    while cur <= hi:
        spine.append(cur)
        cur += dt.timedelta(hours=1)
    want = {}
    for et in ("a", "b", "c"):
        last = None
        for b in spine:
            vs = buckets.get((et, b))
            if vs:
                # engine avg goes through decimal(18,4): inputs have 4
                # decimals, so plain sum/len matches to float tolerance
                avg = sum(vs) / len(vs)
                last = avg
                want[(et, b)] = (len(vs), avg, False)
            else:
                want[(et, b)] = (0, last, True)

    assert set(got) == set(want)
    for k, (n, fv, gap) in want.items():
        gn, gfv, ggap = got[k]
        assert (gn, ggap) == (n, gap), k
        if fv is None:
            assert gfv is None, k
        else:
            assert abs(gfv - fv) < 1e-9, k
