"""Sources, sinks, scalar functions: generator distributions, kafka
option builders, retry/severity tails, net/json-repair helpers."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.functions import (
    cidr_hosts,
    ip_int_to_str,
    ip_str_to_int,
    repair_json_column,
    repair_json_str,
)
from spot_anomalies_flink_workshop_resources_spark.operators.detection import (
    detect_fragmentation_flowlogs,
)
from spot_anomalies_flink_workshop_resources_spark.sources import generators, kafka
from spot_anomalies_flink_workshop_resources_spark.streaming import sinks


def test_cidr_hosts_matches_reference_semantics():
    # normal_events_producer.py:33 takes the first 50 hosts
    hosts = cidr_hosts("10.24.25.0/24", 50)
    assert hosts[0] == "10.24.25.1" and len(hosts) == 50
    assert cidr_hosts("192.168.1.0/30") == ["192.168.1.1", "192.168.1.2"]


def test_ip_conversions_roundtrip(spark):
    df = spark.createDataFrame([("10.34.2.7",), ("255.255.255.255",)], ["ip"])
    out = df.select(
        ip_int_to_str(ip_str_to_int(F.col("ip"))).alias("rt")
    ).collect()
    assert [r.rt for r in out] == ["10.34.2.7", "255.255.255.255"]


def test_normal_traffic_batch_distributions(spark):
    df = generators.normal_traffic_batch(spark, 2000, start_ts=1.7e9).cache()
    rows = df.agg(
        F.min("packets").alias("pmin"),
        F.max("packets").alias("pmax"),
        F.min("bytes").alias("bmin"),
        F.max("bytes").alias("bmax"),
        F.countDistinct("event_type").alias("types"),
    ).collect()[0]
    assert rows.pmin >= 100 and rows.pmax <= 500
    assert rows.bmin >= 64 and rows.bmax <= 1500
    assert rows.types == 5
    # normal traffic alone must not trigger the detector (packets>=100)
    assert detect_fragmentation_flowlogs(df).count() == 0
    df.unpersist()


def test_attack_burst_detected_end_to_end(spark):
    normal = generators.normal_traffic_batch(spark, 500, start_ts=1.7e9)
    burst = generators.attack_burst(spark, n=50, start_ts=1.7e9 + 10)
    # burst target then sees one normal event (packets>10) closing the match
    target = burst.select("ip_dst").first().ip_dst
    closer = burst.limit(1).select(
        F.lit("GET").alias("event_type"),
        F.lit("1.2.3.4").alias("ip_src"),
        F.col("ip_dst"),
        F.lit("443").alias("port_src"),
        F.lit("8080").alias("port_dst"),
        F.lit("TCP").alias("ip_proto"),
        F.lit(int((1.7e9 + 20) * 1000)).alias("timestamp_start"),
        F.lit(int((1.7e9 + 20) * 1000) + 10).alias("timestamp_end"),
        F.timestamp_micros(F.lit(int((1.7e9 + 20) * 1e6))).alias("event_time"),
        F.timestamp_micros(F.lit(int((1.7e9 + 20) * 1e6) + 10000)).alias(
            "event_time_end"
        ),
        F.lit(250).cast("long").alias("packets"),
        F.lit(9000).cast("long").alias("bytes"),
        F.lit("eni-x").alias("writer_id"),
        F.lit("ok").alias("text"),
    )
    events = normal.unionByName(burst).unionByName(closer)
    out = detect_fragmentation_flowlogs(events).collect()
    assert len(out) == 1
    m = out[0]
    assert m.target_ip == target
    assert m.fragment_count == 30  # 50-event burst, greedy cap at 30
    assert m.avg_packets == 250.0
    assert 8 <= m.avg_fragment_size <= 64


def test_replay_injection_rate(spark):
    dim = spark.createDataFrame(
        [("eni-1", "10.0.3.60"), ("eni-2", "10.0.3.61")], ["writer_id", "ip"]
    )
    df = generators.replay_with_injection(
        spark, dim, n=20000, start_ts=1.7e9, anomaly_rate=0.001
    ).cache()
    n_anom = df.where(F.col("packets") == 1).count()
    assert 5 <= n_anom <= 60  # ~20 expected at 0.1%
    # non-anomalous rows take writer_id from the dimension table (J2 lookup)
    assert df.where(F.col("writer_id").isin("eni-1", "eni-2")).count() == 20000
    df.unpersist()


def test_kafka_option_builders():
    opts = kafka.source_options("b:9098", "flow-log-ingest", init_pos="EARLIEST")
    assert opts["startingOffsets"] == "earliest"
    assert opts["subscribe"] == "flow-log-ingest"
    assert kafka.source_options("b", "t", init_pos="LATEST")["startingOffsets"] == "latest"
    ts = kafka.source_options("b", "t", init_pos="TIMESTAMP", init_timestamp_ms=123)
    assert ts["startingTimestamp"] == "123"
    with pytest.raises(ValueError):
        kafka.source_options("b", "t", init_pos="TIMESTAMP")
    with pytest.raises(ValueError):
        kafka.source_options("b", "t", init_pos="bogus")
    assert kafka.sink_options("b:9098", "flow-log-egress")["topic"] == "flow-log-egress"
    assert kafka.iam_auth_options()["kafka.sasl.mechanism"] == "AWS_MSK_IAM"


def test_retry_policy_backoff_and_reraise():
    sleeps, calls = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("throttled")
        return "ok"

    assert sinks.with_retries(flaky, sleep=sleeps.append) == "ok"
    assert sleeps == [2, 3]  # 2^0+1, 2^1+1 (summarization.py:81-92)

    def always_fails():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        sinks.with_retries(always_fails, sleep=lambda s: None)


def test_severity_gate_and_notification_tail(spark):
    batch = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], ["ip_address", "severity"]
    )
    sent = []
    tail = sinks.notification_foreach_batch(
        lambda rec: sent.append(rec["ip_address"]), min_severity=2,
        sleep=lambda s: None,
    )
    tail(batch, epoch_id=0)
    assert sorted(sent) == ["b", "c"]


def test_repair_json_python_and_column(spark):
    raw = '```json\n{"incident_report": "line1\nline2", "severity": "2"}\n```'
    fixed = repair_json_str(raw)
    assert json.loads(fixed)["severity"] == "2"
    assert repair_json_str("no braces here") is None
    # '{' with no closing '}' must be None in BOTH twins (regression:
    # the column variant once emitted a truncated non-JSON body)
    unterminated = '{"incident_report": "cut off'
    assert repair_json_str(unterminated) is None
    df = spark.createDataFrame([(raw,), ("garbage",), (unterminated,)], ["s"])
    out = df.select(repair_json_column(F.col("s")).alias("r")).collect()
    assert json.loads(out[0].r)["severity"] == "2"
    assert out[1].r is None
    assert out[2].r is None
