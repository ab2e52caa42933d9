"""Kafka-contract e2e: the full reference loop
(Kafka -> JSON deserialize -> keyed CEP -> AttackResult -> JSON -> Kafka,
AnomalyDetection.java:116-181) over the file-backed fake broker, which
reproduces the connector's exact read/write schema. The live connector
remains env-blocked (no jar/broker/network — COVERAGE.md S1/S5)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from spot_anomalies_flink_workshop_resources_spark.sources.fake_broker import (
    FileFakeBroker,
)
from spot_anomalies_flink_workshop_resources_spark.streaming.pipeline import (
    build_anomaly_pipeline,
    start_pipeline,
)

BASE_MS = 1713389653000  # 2024-04-17T21:34:13Z


def _event(i: int, packets: int, bytes_: int, ts_ms: int, **over) -> str:
    """test_event.json-shaped payload (string ports, epoch-ms ints by
    default — the producers' wire form)."""
    rec = {
        "event_type": "GET",
        "ip_src": "165.225.26.101",
        "ip_dst": "10.0.3.60",
        "port_src": "443",
        "port_dst": "8080",
        "ip_proto": "TCP",
        "timestamp_start": ts_ms,
        "timestamp_end": ts_ms + 10,
        "packets": packets,
        "bytes": bytes_,
        "writer_id": "eni-095bb4db87156aa49",
        "text": f"GET /product?id={i} HTTP/1.1",
    }
    rec.update(over)
    return json.dumps(rec)


def _ingest_payloads() -> list[str]:
    msgs = []
    # 12-fragment burst: packets=1, bytes in [8,64] (lambda_handler.py:93-112)
    for i in range(12):
        msgs.append(_event(i, 1, 8 + i * 4, BASE_MS + i * 1000))
    # one replay-shaped fragment: DATETIME-STRING timestamps + int port +
    # an unknown field (wire tolerance: producer/lambda_function.py:219-220,
    # :32-33; unknown-drop per JsonDeserializationSchema.java:80)
    msgs.append(
        _event(
            99, 1, 60, 0,
            timestamp_start="2024-04-17 21:34:25",
            timestamp_end="2024-04-17 21:34:25.010",
            port_dst=8080,
            mystery_field="ignored",
        )
    )
    # closing normal event (packets>10) fires the pattern
    msgs.append(_event(100, 250, 9000, BASE_MS + 13000))
    # unrelated key: normal traffic only, must not alert
    for i in range(3):
        msgs.append(
            _event(200 + i, 300, 90000, BASE_MS + i * 500, ip_dst="10.0.9.9")
        )
    return msgs


def test_broker_wire_schema_and_offsets(spark, tmp_path):
    broker = FileFakeBroker(str(tmp_path / "broker"), n_partitions=3)
    df = spark.createDataFrame([(m,) for m in _ingest_payloads()], ["value"])
    n1 = broker.produce(df, "flow-log-ingest")
    n2 = broker.produce(df.limit(5), "flow-log-ingest")
    assert (n1, n2) == (17, 5)

    wire = broker.read_batch(spark, "flow-log-ingest")
    types = {f.name: type(f.dataType) for f in wire.schema.fields}
    assert types == {
        "key": BinaryType,
        "value": BinaryType,
        "topic": StringType,
        "partition": IntegerType,
        "offset": LongType,
        "timestamp": TimestampType,
        "timestampType": IntegerType,
    }
    # per-partition offsets contiguous from 0 across BOTH produce calls
    for p, offs in {
        r["partition"]: r["offs"]
        for r in wire.groupBy("partition")
        .agg(F.sort_array(F.collect_list("offset")).alias("offs"))
        .collect()
    }.items():
        assert offs == list(range(len(offs))), f"partition {p}: {offs}"
    assert wire.count() == 22


def test_kafka_roundtrip_attack_result_contract(spark, tmp_path):
    """Ingest topic -> parse -> detector -> wire JSON -> egress topic,
    then decode like the reference consumer (b64 + json.loads) and check
    the epoch-SECONDS AttackResult contract + formulas
    (AD.java:157-166; summarization.py:20-28)."""
    broker = FileFakeBroker(str(tmp_path / "broker"), n_partitions=2)
    df = spark.createDataFrame([(m,) for m in _ingest_payloads()], ["value"])
    broker.produce(df, "flow-log-ingest")

    raw = broker.read_stream(spark, "flow-log-ingest")
    payload = build_anomaly_pipeline(raw, watermark="0 seconds")
    q = start_pipeline(
        payload, broker.sink("flow-log-egress", str(tmp_path / "ckpt"))
    )
    q.processAllAvailable()
    q.stop()

    alerts = broker.consume_values(spark, "flow-log-egress")
    assert len(alerts) == 1
    a = alerts[0]
    assert a["target_ip"] == "10.0.3.60"
    assert a["attacker_id"] == "165.225.26.101"
    # 12 epoch-ms fragments + the datetime-string replay fragment
    assert a["fragment_count"] == 13
    # epoch-second decimals, NOT ISO strings (JavaTimeModule contract)
    assert a["attack_start_time"] == pytest.approx(BASE_MS / 1000.0)
    assert a["attack_end_time"] == pytest.approx(
        (BASE_MS + 12000) / 1000.0 + 0.010
    )
    assert a["avg_packets"] == pytest.approx(250.0)
    expected_avg_frag = (sum(8 + i * 4 for i in range(12)) / 1 + 60) / 13
    assert a["avg_fragment_size"] == pytest.approx(expected_avg_frag)
    assert a["size_reduction_percent"] == pytest.approx(
        (250.0 - expected_avg_frag) / 250.0 * 100.0
    )
