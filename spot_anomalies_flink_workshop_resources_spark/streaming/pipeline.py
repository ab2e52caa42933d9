"""End-to-end streaming pipeline builder (reference §3.1 lifecycle).

The reference job is: Kafka source → JSON deserialize → keyBy(ip_dst) →
CEP → select(AttackResult) → JSON serialize → Kafka sink
(AnomalyDetection.java:116-181). The engine twin:

    raw = kafka.read_stream(spark, kafka.source_options(...))   # S1/S2
    events = serde.parse_events(raw)                            # S3
    alerts = detector.detect_fragmentation_flowlogs_stream(events)  # W1-W6
    payload = serde.attack_results_to_json(alerts)              # S4
    kafka.write_stream(payload, kafka.sink_options(...), ckpt).start()  # S5

``build_anomaly_pipeline`` wires those stages over any raw source
(kafka / files / rate-generator) and any sink builder, which is how the
tests run the full topology without a broker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .. import serde
from . import detector


def build_anomaly_pipeline(
    raw_source: DataFrame,
    *,
    value_col: str = "value",
    watermark: str = "0 seconds",
    to_wire_json: bool = True,
) -> DataFrame:
    """raw JSON payload stream -> AttackResult stream (optionally wire-JSON)."""
    events = serde.parse_events(raw_source, value_col=value_col)
    alerts = detector.detect_fragmentation_flowlogs_stream(
        events, watermark=watermark
    )
    return serde.attack_results_to_json(alerts) if to_wire_json else alerts


def start_pipeline(
    alerts: DataFrame,
    sink: Callable[[DataFrame], object],
):
    """Attach a sink builder (returns a DataStreamWriter) and start it."""
    return sink(alerts).start()
