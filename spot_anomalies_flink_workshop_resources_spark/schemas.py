"""Typed schemas for the flow-log Event and AttackResult records.

Reference parity:
- Event fields: flink-app/.../process/model/Event.java:33-57 (sample at
  /root/reference/test_event.json). Ports are strings on the wire but one
  producer emits ints (code/lambdas/producer/lambda_function.py:32-33);
  timestamps arrive as epoch-ms ints from two producers
  (normal_events_producer.py:76,85-86) but datetime strings from the
  S3-replay producer (code/lambdas/producer/lambda_function.py:219-220).
  The tolerant-parse helpers in serde.py normalize both.
- AttackResult fields: .../process/model/AttackResult.java:13-30, formulas
  AnomalyDetection.java:146-166. Timestamps serialize as epoch-second
  doubles (Jackson JavaTimeModule contract; consumers call
  datetime.fromtimestamp — code/lambdas/invoke_agent/summarization.py:20-21).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Wire schema: everything string-or-long tolerant. Raw JSON is parsed with
# every numeric-ish field as StringType first (PERMISSIVE, unknown fields
# dropped — JsonDeserializationSchema.java:80), then cast in serde.py.
EVENT_WIRE_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ip_src", StringType()),
        StructField("ip_dst", StringType()),
        StructField("port_src", StringType()),
        StructField("port_dst", StringType()),
        StructField("ip_proto", StringType()),
        StructField("timestamp_start", StringType()),
        StructField("timestamp_end", StringType()),
        StructField("packets", LongType()),
        StructField("bytes", LongType()),
        StructField("writer_id", StringType()),
        StructField("text", StringType()),
    ]
)

# Normalized in-engine schema: timestamps resolved to TimestampType (the
# event-time column is timestamp_start — Event.java:59-61
# getCalculatedEventTime).
EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ip_src", StringType()),
        StructField("ip_dst", StringType()),
        StructField("port_src", StringType()),
        StructField("port_dst", StringType()),
        StructField("ip_proto", StringType()),
        StructField("timestamp_start", LongType()),  # epoch millis
        StructField("timestamp_end", LongType()),  # epoch millis
        StructField("event_time", TimestampType()),  # from timestamp_start
        StructField("packets", LongType()),
        StructField("bytes", LongType()),
        StructField("writer_id", StringType()),
        StructField("text", StringType()),
    ]
)

# Output record — AttackResult.java:13-30. Timestamps kept as epoch-second
# doubles end-to-end so to_json matches the reference wire contract.
ATTACK_RESULT_SCHEMA = StructType(
    [
        StructField("attack_start_time", DoubleType()),
        StructField("attack_end_time", DoubleType()),
        StructField("attacker_id", StringType()),
        StructField("target_ip", StringType()),
        StructField("fragment_count", LongType()),
        StructField("avg_packets", DoubleType()),
        StructField("avg_fragment_size", DoubleType()),
        StructField("size_reduction_percent", DoubleType()),
    ]
)
