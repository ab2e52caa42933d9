"""JSON SerDe layer for the flow-log Event / AttackResult wire formats.

Reference parity:
- Input tolerance (JsonDeserializationSchema.java:70-80): unknown JSON
  fields ignored, missing fields null — ``from_json`` PERMISSIVE gives
  both. Timestamps arrive either as epoch-ms integers
  (normal_events_producer.py:76,85-86;
  code/lambdas/fragmentation_attack/lambda_handler.py:102-103) or as
  datetime strings ("2024-04-17 21:34:13.492868" —
  code/lambdas/producer/lambda_function.py:219-220, test_event.json:8-9);
  ports arrive as strings or ints
  (code/lambdas/producer/lambda_function.py:32-33).
- Output contract (JsonSerializationSchema.java:40-79 + JavaTimeModule):
  AttackResult timestamps serialize as epoch-SECOND decimals, because the
  consumers call datetime.fromtimestamp on them
  (code/lambdas/invoke_agent/summarization.py:20-21). Our detector
  already carries epoch-second doubles, so ``to_json`` emits them as-is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schemas import EVENT_WIRE_SCHEMA


def _tolerant_epoch_ms(col: Column) -> Column:
    """String column that is either epoch-ms digits or a datetime string
    -> epoch milliseconds (long). Unparseable -> null (PERMISSIVE)."""
    is_digits = col.rlike("^[0-9]+$")
    from_str = (F.to_timestamp(col).cast("double") * 1000).cast("long")
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(
        F.when(is_digits, col.cast("long")).otherwise(from_str)
    )


def parse_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-style bytes/string payload -> normalized Event rows.

    Accepts a DataFrame with a JSON payload column (binary or string);
    returns the normalized EVENT_SCHEMA columns: epoch-ms longs plus the
    derived ``event_time``/``event_time_end`` timestamps
    (Event.java:59-61 getCalculatedEventTime null-guard included: a null
    timestamp_start yields a null event_time, and downstream detection
    drops such rows exactly as Flink's watermark assigner would stall
    them).
    """
    parsed = raw.withColumn(
        "_ev", F.from_json(F.col(value_col).cast("string"), EVENT_WIRE_SCHEMA)
    ).select("_ev.*")
    ts_start = _tolerant_epoch_ms(F.col("timestamp_start"))
    ts_end = _tolerant_epoch_ms(F.col("timestamp_end"))
    return parsed.select(
        "event_type",
        "ip_src",
        "ip_dst",
        F.col("port_src").cast("string").alias("port_src"),
        F.col("port_dst").cast("string").alias("port_dst"),
        "ip_proto",
        ts_start.alias("timestamp_start"),
        ts_end.alias("timestamp_end"),
        F.timestamp_micros(ts_start * 1000).alias("event_time"),
        F.timestamp_micros(ts_end * 1000).alias("event_time_end"),
        "packets",
        "bytes",
        "writer_id",
        "text",
    )


def attack_results_to_json(results: DataFrame) -> DataFrame:
    """AttackResult rows -> single-column ``value`` JSON strings matching
    the reference wire contract (epoch-second decimal timestamps)."""
    cols = [
        "attack_start_time",
        "attack_end_time",
        "attacker_id",
        "target_ip",
        "fragment_count",
        "avg_packets",
        "avg_fragment_size",
        "size_reduction_percent",
    ]
    return results.select(F.to_json(F.struct(*cols)).alias("value"))
