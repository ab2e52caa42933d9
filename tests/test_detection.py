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
