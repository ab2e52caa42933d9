"""Alert-consumer enrichment tail tests (§3.2: prompt → LLM → parse →
severity gate → notify) with a fake model client."""

from __future__ import annotations

import json

from pyspark.sql import Row

from spot_anomalies_flink_workshop_resources_spark.streaming.enrich import (
    alert_consumer_foreach_batch,
    format_alert_prompt,
    parse_report,
)

ALERT = Row(
    attack_start_time=1713387600.0,
    attack_end_time=1713387605.5,
    attacker_id="192.168.1.9",
    target_ip="10.0.0.5",
    fragment_count=12,
    avg_packets=200.0,
    avg_fragment_size=32.0,
    size_reduction_percent=84.0,
)


def test_format_alert_prompt_fields(spark):
    df = spark.createDataFrame([ALERT])
    p = format_alert_prompt(df).collect()[0].prompt
    assert "Source IP: 192.168.1.9" in p  # sanitized phrasing (P12)
    assert "Target IP: 10.0.0.5" in p
    assert "Fragment count: 12" in p
    assert "Average packets: 200.00" in p  # :.2f
    assert "Size reduction: 84.0%" in p  # :.1f
    assert "Duration: 5.5 seconds" in p  # P14 timestamp diff
    assert "2024-04-17T21:00:00" in p  # P13 epoch->ISO


def test_parse_report_paths():
    good = '```json\n{"incident_report": "r", "severity": "2", "ip_address": "1.2.3.4"}```'
    assert parse_report(good)["severity"] == "2"
    # fallback substring extraction (action_group.py:110-116)
    fb = parse_report("something about IP: 9.9.9.9 happened")
    assert fb["ip_address"] == "9.9.9.9" and fb["severity"] == "1"
    assert parse_report("no structure at all") is None
    assert parse_report(None) is None


def test_alert_consumer_tail_end_to_end(spark):
    df = spark.createDataFrame([ALERT])
    calls, sent = [], []

    def fake_llm(prompt: str) -> str:
        calls.append(prompt)
        if len(calls) == 1:
            raise RuntimeError("ThrottlingException")  # W8 retry path
        return json.dumps(
            {"incident_report": "frag attack", "severity": "2",
             "ip_address": "10.0.0.5"}
        )

    tail = alert_consumer_foreach_batch(
        fake_llm, sent.append, min_severity=2, sleep=lambda s: None
    )
    tail(df, epoch_id=0)
    assert len(calls) == 2  # one throttle, one success
    assert sent[0]["ip_address"] == "10.0.0.5"


def test_oversized_batch_is_chunked_not_collected(spark):
    """W7 batch-cap parity (code_stack.py:432-434): an alert batch
    larger than the 1000-record consumer cap is processed in ≤1000-row
    chunks — every record still handled exactly once."""
    from spot_anomalies_flink_workshop_resources_spark.streaming import sinks

    n = 2500
    df = spark.range(n).selectExpr(
        "CAST(id AS STRING) AS ip_address", "'3' AS severity"
    )
    chunks = list(sinks.iter_record_chunks(df, max_records=1000))
    sizes = [len(c) for c in chunks]
    assert all(s <= 1000 for s in sizes)
    assert sum(sizes) == n
    assert len(chunks) >= 3
    seen = sorted(int(r.ip_address) for c in chunks for r in c)
    assert seen == list(range(n))

    sent: list[str] = []
    tail = sinks.notification_foreach_batch(
        lambda rec: sent.append(rec["ip_address"]), min_severity=2,
        sleep=lambda s: None,
    )
    tail(df, epoch_id=0)
    assert len(sent) == n and len(set(sent)) == n


def test_alert_consumer_severity_gate_blocks(spark):
    df = spark.createDataFrame([ALERT])
    sent = []
    tail = alert_consumer_foreach_batch(
        lambda p: '{"incident_report": "minor", "severity": "1", "ip_address": "x"}',
        sent.append,
        min_severity=2,
        sleep=lambda s: None,
    )
    tail(df, epoch_id=0)
    assert sent == []
