"""Funnel ordering semantics and cohort retention on hand-built data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from spot_anomalies_flink_workshop_resources_spark.operators.funnel import (
    funnel,
    retention,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=u,
                event_type=et,
                value=1.0,
                props="{}",
            )
            for i, (u, et, ts) in enumerate(rows)
        ]
    )


def _t(m):
    return dt.datetime(2024, 1, 1, 12, m)


def test_funnel_requires_strict_order(spark):
    df = _events(
        spark,
        [
            # user 1 completes in order
            (1, "view", _t(0)), (1, "click", _t(1)), (1, "purchase", _t(2)),
            # user 2: click BEFORE the first view -> stalls at view
            (2, "click", _t(0)), (2, "view", _t(1)),
            # user 3: click ties the view timestamp -> tie does not advance
            (3, "view", _t(0)), (3, "click", _t(0)),
            # user 4: purchase without click -> stalls at view
            (4, "view", _t(0)), (4, "purchase", _t(5)),
            # user 5: never views
            (5, "purchase", _t(0)),
        ],
    )
    out = {r.stage: r.n_users for r in funnel(df).collect()}
    assert out == {"view": 4, "click": 1, "purchase": 1}


def test_funnel_later_click_still_counts(spark):
    # the FIRST click after the first view qualifies even when earlier
    # clicks exist before the view
    df = _events(
        spark,
        [
            (1, "click", _t(0)), (1, "view", _t(1)), (1, "click", _t(2)),
            (1, "purchase", _t(3)),
        ],
    )
    out = {r.stage: r.n_users for r in funnel(df).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_single_exchange_plan(spark):
    df = _events(spark, [(1, "view", _t(0))])
    p = funnel(df)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # all three stage windows + the per-user rollup share one user_id
    # hash partitioning: exactly one hash exchange (the second exchange
    # is the SinglePartition gather of the 3-long global-count row)
    assert p.count("Arguments: hashpartitioning") == 1, p
    assert p.count("Arguments: SinglePartition") == 1, p


def test_retention_offsets(spark):
    w0 = dt.datetime(2024, 1, 1)   # a Monday
    w1 = w0 + dt.timedelta(days=7)
    w3 = w0 + dt.timedelta(days=21)
    df = _events(
        spark,
        [
            (1, "view", w0), (1, "view", w1), (1, "view", w3),
            (2, "view", w1),
            (2, "view", w1 + dt.timedelta(days=2)),  # same week: one row
        ],
    )
    out = {
        (r.cohort_week.date(), r.week_offset): r.n_active_users
        for r in retention(df).collect()
    }
    assert out == {
        (w0.date(), 0): 1,
        (w0.date(), 1): 1,
        (w0.date(), 3): 1,
        (w1.date(), 0): 1,
    }


def _py_funnel(rows, stages=("view", "click", "purchase")):
    """Pure-Python reference: strictly-ordered first-occurrence times."""
    by_user = {}
    for u, et, ts in rows:
        by_user.setdefault(u, []).append((ts, et))
    counts = [0] * len(stages)
    for evs in by_user.values():
        evs.sort()
        t_prev = None
        for i, s in enumerate(stages):
            t_s = None
            for ts, et in evs:
                if et == s and (t_prev is None or ts > t_prev):
                    t_s = ts
                    break
            if t_s is None:
                break
            counts[i] += 1
            t_prev = t_s
    return {s: counts[i] for i, s in enumerate(stages)}


def test_funnel_matches_python_reference_on_random_sequences(spark):
    import random

    rng = random.Random(99)
    types = ["view", "click", "purchase", "signup"]
    rows = [
        (
            rng.randint(1, 12),
            rng.choice(types),
            _t(rng.randint(0, 59)),
        )
        for _ in range(300)
    ]
    # drop exact (user, ts) duplicate coordinates: with ties inside one
    # user the strict-order reference depends on event ordering at the
    # same timestamp, which the engine breaks by window-min semantics
    # deterministically but the naive reference does not model
    seen = set()
    uniq = []
    for r in rows:
        if (r[0], r[2]) not in seen:
            seen.add((r[0], r[2]))
            uniq.append(r)
    df = _events(spark, uniq)
    got = {r.stage: r.n_users for r in funnel(df).collect()}
    want = _py_funnel(uniq)
    assert got == want


def test_funnel_within_deadline(spark):
    df = _events(
        spark,
        [
            # user 1: click 30 min after view -> converts under 1 hour
            (1, "view", _t(0)), (1, "click", _t(30)),
            # user 2: click 90 min after view -> misses a 1-hour deadline
            (2, "view", _t(0)),
            (2, "click", dt.datetime(2024, 1, 1, 13, 45)),
        ],
    )
    loose = {r.stage: r.n_users for r in funnel(df).collect()}
    tight = {
        r.stage: r.n_users for r in funnel(df, within="1 hour").collect()
    }
    assert loose == {"view": 2, "click": 2, "purchase": 0}
    assert tight == {"view": 2, "click": 1, "purchase": 0}


def test_attribution_fixture(spark, tmp_path):
    """First/last-touch credit on a hand-built user history: lookback
    cutoff excludes an old touch; (ts, event_id) tie order is strict;
    a touch-less purchase lands in the NULL channel."""
    import datetime as dt

    from pyspark.sql import Row

    from spot_anomalies_flink_workshop_resources_spark.plans.relational import (
        events_attribution,
    )

    t0 = dt.datetime(2026, 1, 10, 12, 0, 0)

    def ev(eid, days_off, utype, u=1, value=10.0):
        return Row(
            event_id=eid,
            ts=t0 + dt.timedelta(days=days_off),
            user_id=u,
            event_type=utype,
            value=float(value),
            props="{}",
        )

    rows = [
        ev(1, -8.0, "view"),        # outside the 7-day lookback
        ev(2, -6.0, "click"),       # first touch in window
        ev(3, -1.0, "signup"),      # last touch
        ev(4, 0.0, "purchase", value=100.0),
        ev(5, 0.0, "purchase", u=2, value=50.0),  # user 2: no touches
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = {
        (r.model, r.channel): (r.n_purchases, r.attributed_value)
        for r in events_attribution(spark, d).collect()
    }
    assert out[("first_touch", "click")] == (1, 100.0)
    assert out[("last_touch", "signup")] == (1, 100.0)
    assert out[("first_touch", None)] == (1, 50.0)
    assert out[("last_touch", None)] == (1, 50.0)
    assert len(out) == 4
