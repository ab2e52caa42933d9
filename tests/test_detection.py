"""Detection-operator semantics, pinned to the reference pattern:

packets<10 run of times(10,30), followedBy packets>10, within 60 s,
skipPastLastEvent (AnomalyDetection.java:126-132), AttackResult formulas
(AnomalyDetection.java:146-166). Fixture shapes per FIXTURES.md §1.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from spot_anomalies_flink_workshop_resources_spark.operators.detection import (
    detect_attack_runs,
    detect_fragmentation_flowlogs,
)

T0 = dt.datetime(2024, 4, 17, 21, 0, 0)

FLOW_SCHEMA = StructType(
    [
        StructField("ip_dst", StringType()),
        StructField("ip_src", StringType()),
        StructField("event_time", TimestampType()),
        StructField("event_time_end", TimestampType()),
        StructField("timestamp_start", LongType()),
        StructField("packets", LongType()),
        StructField("bytes", LongType()),
    ]
)


def _ev(ip_dst, ip_src, sec, packets, bytes_=None):
    t = T0 + dt.timedelta(seconds=sec)
    ms = int(t.timestamp() * 1000)
    return (ip_dst, ip_src, t, t + dt.timedelta(milliseconds=10), ms, packets,
            bytes_ if bytes_ is not None else packets * 100)


def _burst(ip_dst, ip_src, start_sec, n, packets=1, bytes_=32, step=0.5):
    return [
        _ev(ip_dst, ip_src, start_sec + i * step, packets, bytes_) for i in range(n)
    ]


def _detect(spark, rows):
    df = spark.createDataFrame(rows, FLOW_SCHEMA)
    return detect_fragmentation_flowlogs(df).collect()


def test_basic_match_with_formulas(spark):
    # 12 fragments (packets=1, bytes=32) then one normal event packets=200
    rows = _burst("10.0.0.5", "192.168.1.9", 0, 12) + [
        _ev("10.0.0.5", "1.2.3.4", 10, 200, 15000)
    ]
    out = _detect(spark, rows)
    assert len(out) == 1
    m = out[0]
    assert m.target_ip == "10.0.0.5"
    assert m.attacker_id == "192.168.1.9"  # ip_src of FIRST anomalous event
    assert m.fragment_count == 12
    assert m.avg_packets == 200.0  # mean packets of the single trigger event
    assert m.avg_fragment_size == pytest.approx(32.0)  # mean of bytes/packets
    assert m.size_reduction_percent == pytest.approx((200 - 32) / 200 * 100)
    # attack_start = first anomalous event's time, end = LAST anomalous
    # event's end (AD.java:158-159) — not the trigger's
    assert m.attack_start_time == pytest.approx(T0.timestamp())
    assert m.attack_end_time == pytest.approx(
        (T0 + dt.timedelta(seconds=11 * 0.5, milliseconds=10)).timestamp()
    )


def test_run_too_short_no_match(spark):
    rows = _burst("10.0.0.5", "a", 0, 9) + [_ev("10.0.0.5", "b", 10, 200)]
    assert _detect(spark, rows) == []


def test_run_exactly_ten_matches(spark):
    rows = _burst("10.0.0.5", "a", 0, 10) + [_ev("10.0.0.5", "b", 10, 200)]
    out = _detect(spark, rows)
    assert len(out) == 1 and out[0].fragment_count == 10


def test_long_run_capped_at_thirty(spark):
    # 50 low-packet events then a trigger: greedy NFA consumes the first 30
    rows = _burst("10.0.0.5", "a", 0, 50, step=0.5) + [
        _ev("10.0.0.5", "b", 30, 200)
    ]
    out = _detect(spark, rows)
    assert len(out) == 1
    assert out[0].fragment_count == 30
    # end time = 30th anomalous event's end
    assert out[0].attack_end_time == pytest.approx(
        (T0 + dt.timedelta(seconds=29 * 0.5, milliseconds=10)).timestamp()
    )


def test_no_trigger_no_match(spark):
    rows = _burst("10.0.0.5", "a", 0, 15)
    assert _detect(spark, rows) == []


def test_packets_equal_ten_is_neutral(spark):
    # packets == 10 matches neither predicate (AD.java:127,130): it neither
    # breaks the run nor triggers
    rows = (
        _burst("10.0.0.5", "a", 0, 6)
        + [_ev("10.0.0.5", "x", 3.1, 10)]
        + _burst("10.0.0.5", "a", 4, 6)
        + [_ev("10.0.0.5", "b", 10, 200)]
    )
    out = _detect(spark, rows)
    assert len(out) == 1 and out[0].fragment_count == 12


def test_window_exceeded_no_match(spark):
    # trigger arrives 70 s after first fragment: outside within(60s)
    rows = _burst("10.0.0.5", "a", 0, 12, step=1.0) + [
        _ev("10.0.0.5", "b", 70, 200)
    ]
    assert _detect(spark, rows) == []


def test_non_overlap_two_matches(spark):
    # two clean bursts for the same key → two distinct matches
    rows = (
        _burst("10.0.0.5", "a", 0, 12)
        + [_ev("10.0.0.5", "b", 8, 200)]
        + _burst("10.0.0.5", "c", 100, 15)
        + [_ev("10.0.0.5", "d", 110, 300)]
    )
    out = sorted(_detect(spark, rows), key=lambda r: r.attack_start_time)
    assert len(out) == 2
    assert out[0].fragment_count == 12 and out[0].attacker_id == "a"
    assert out[1].fragment_count == 15 and out[1].attacker_id == "c"
    assert out[1].avg_packets == 300.0


def test_keys_are_independent(spark):
    rows = (
        _burst("10.0.0.5", "a", 0, 12)
        + [_ev("10.0.0.5", "b", 8, 200)]
        + _burst("10.9.9.9", "z", 0, 5)  # too short on another key
        + [_ev("10.9.9.9", "y", 8, 200)]
    )
    out = _detect(spark, rows)
    assert len(out) == 1 and out[0].target_ip == "10.0.0.5"


def test_normal_traffic_only_no_match(spark):
    rows = [_ev("10.0.0.5", "a", i, 100 + i) for i in range(40)]
    assert _detect(spark, rows) == []


def test_generic_detector_on_events_table(spark, sf_dir):
    from spot_anomalies_flink_workshop_resources_spark.plans.harness import (
        cep_fragmentation,
    )

    out = cep_fragmentation(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert 2 <= r.fragment_count <= 5
        assert r.avg_packets > 20.0
        assert r.avg_fragment_size < 10.0


def test_end_time_is_last_event_not_max(spark):
    """Overlapping flows: a mid-run fragment whose flow END is later than
    the last fragment's end. The reference reports last.getTsEnd()
    (AD.java:159) — the LAST matched event's end in (ts, oid) order —
    not MAX(end_ts) over matched events. Keeps batch == streaming twin."""
    rows = _burst("10.0.0.5", "192.168.1.9", 0, 12)
    # event at sec 2 belongs to a long-lived flow ending AFTER the run
    long_flow = list(rows[4])
    long_flow[3] = T0 + dt.timedelta(seconds=100)
    rows[4] = tuple(long_flow)
    rows.append(_ev("10.0.0.5", "1.2.3.4", 10, 200, 15000))
    out = _detect(spark, rows)
    assert len(out) == 1
    expect_end = (T0 + dt.timedelta(seconds=11 * 0.5, milliseconds=10)).timestamp()
    assert out[0].attack_end_time == pytest.approx(expect_end)


def _skew_params():
    return dict(
        key_col="k", time_col="t", order_col="oid", metric_col="m",
        low_threshold=10.0, high_threshold=20.0, min_run=3, max_run=6,
        window_seconds=300.0,
    )


def _mk_events(spark, seqs):
    """seqs: {key: [(sec, metric), ...]} -> DataFrame(k,t,oid,m)."""
    rows = []
    for k, evs in seqs.items():
        for i, (sec, m) in enumerate(evs):
            rows.append((k, T0 + dt.timedelta(seconds=sec), i, float(m)))
    return spark.createDataFrame(rows, "k string, t timestamp, oid long, m double")


def _alerts_key(rows):
    return sorted(
        (r.target_key, round(r.attack_start_time, 6), round(r.attack_end_time, 6),
         r.attacker_id, r.fragment_count, round(r.avg_packets, 9),
         round(r.avg_fragment_size, 9), round(r.size_reduction_percent, 9))
        for r in rows
    )


def _assert_equiv(spark, seqs, bucket_seconds):
    from spot_anomalies_flink_workshop_resources_spark.operators.detection import (
        detect_attack_runs_skew_split,
    )

    df = _mk_events(spark, seqs)
    base = detect_attack_runs(df, **_skew_params()).collect()
    split = detect_attack_runs_skew_split(
        df, **_skew_params(), bucket_seconds=bucket_seconds
    ).collect()
    assert _alerts_key(split) == _alerts_key(base), (
        f"bucket_seconds={bucket_seconds}: {_alerts_key(split)} "
        f"!= {_alerts_key(base)}"
    )
    return base


def test_skew_split_boundary_cases(spark):
    """Crafted boundary shapes: run crossing two buckets; an all-anomalous
    middle bucket (pure carry-through); trigger as a bucket's first event
    (empty head + carried run); saturated run (> max_run) across buckets."""
    seqs = {
        # run starts in bucket 0 (0-9s), trigger in bucket 1 (10-19s)
        "cross": [(8, 1), (9, 1), (11, 1), (12, 100)],
        # buckets: [A A] [A A] [A trigger] — middle bucket pure
        "pure_mid": [(8, 1), (9, 1), (12, 1), (13, 1), (21, 1), (23, 100)],
        # trigger is the first event of bucket 1; run entirely in bucket 0
        "empty_head": [(5, 1), (6, 1), (7, 1), (10, 100)],
        # 9 anomalous events over 3 buckets: matched caps at max_run=6
        "saturated": [(s, 1) for s in (1, 2, 3, 11, 12, 13, 21, 22, 23)]
        + [(25, 100)],
        # no trigger ever: no alert
        "never": [(1, 1), (2, 1), (3, 1)],
        # window exceeded across buckets (span > 300 s)
        "stale": [(0, 1), (150, 1), (301, 1), (320, 100)],
    }
    base = _assert_equiv(spark, seqs, bucket_seconds=10.0)
    by_key = {r.target_key: r for r in base}
    assert set(by_key) == {"cross", "pure_mid", "empty_head", "saturated"}
    assert by_key["saturated"].fragment_count == 6  # capped at max_run


def test_null_ts_and_metric_rows_dropped_identically(spark):
    """Null event times (and null metrics) are dropped by BOTH the
    one-shot operator and the skew-split twin — the 'same output, any
    input' contract must hold on dirty inputs too (ADVICE r2: the twin
    filtered null ts, the base did not)."""
    rows = [
        ("k", T0 + dt.timedelta(seconds=s), i, float(m))
        for i, (s, m) in enumerate([(1, 1), (2, 1), (3, 1), (4, 100)])
    ]
    dirty = rows + [("k", None, 99, 1.0), ("k", T0, 98, None)]
    df = spark.createDataFrame(
        dirty, "k string, t timestamp, oid long, m double"
    )
    clean = spark.createDataFrame(
        rows, "k string, t timestamp, oid long, m double"
    )
    from spot_anomalies_flink_workshop_resources_spark.operators.detection import (
        detect_attack_runs_skew_split,
    )

    base_dirty = detect_attack_runs(df, **_skew_params()).collect()
    base_clean = detect_attack_runs(clean, **_skew_params()).collect()
    split_dirty = detect_attack_runs_skew_split(
        df, **_skew_params(), bucket_seconds=2.0
    ).collect()
    assert _alerts_key(base_dirty) == _alerts_key(base_clean)
    assert _alerts_key(split_dirty) == _alerts_key(base_clean)
    assert len(base_clean) == 1


def test_skew_split_randomized_equivalence(spark):
    """Random metric sequences over several keys, compared at three
    bucket granularities (including 1 s: nearly every event its own
    bucket — maximal stitching)."""
    import random

    rng = random.Random(42)
    choices = [1.0, 5.0, 15.0, 100.0, 200.0]
    seqs = {
        f"k{i}": [
            (s * rng.uniform(0.5, 3.0), rng.choice(choices))
            for s in range(rng.randint(10, 60))
        ]
        for i in range(6)
    }
    for bucket_seconds in (1.0, 17.0, 1e6):
        _assert_equiv(spark, seqs, bucket_seconds)
