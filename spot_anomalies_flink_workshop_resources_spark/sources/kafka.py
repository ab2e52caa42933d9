"""Kafka source/sink configuration (reference S1/S2/S5).

Maps the reference's KafkaSource/KafkaSink builders
(AnomalyDetection.java:116-119, 170-179) and offsets initializer
(AnomalyDetection.java:102-114: EARLIEST / LATEST / TIMESTAMP from the
``initpos`` config key) onto Structured Streaming reader/writer options.

These are pure option builders — the local harness has no Kafka broker
(and no kafka-sql jar), so ``read_stream``/``write_stream`` raise a clear
error if invoked without the connector on the classpath, while the
option dicts themselves are unit-testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def source_options(
    bootstrap_servers: str,
    topic: str,
    *,
    group_id: str = "AnomalyDetectorApp",
    init_pos: str = "EARLIEST",
    init_timestamp_ms: int | None = None,
) -> dict[str, str]:
    """Consumer options. ``init_pos`` ∈ {EARLIEST, LATEST, TIMESTAMP}
    mirrors AnomalyDetection.java:102-114."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "kafka.group.id": group_id,
    }
    pos = init_pos.upper()
    if pos == "EARLIEST":
        opts["startingOffsets"] = "earliest"
    elif pos == "LATEST":
        opts["startingOffsets"] = "latest"
    elif pos == "TIMESTAMP":
        if init_timestamp_ms is None:
            raise ValueError("TIMESTAMP init_pos requires init_timestamp_ms")
        opts["startingTimestamp"] = str(init_timestamp_ms)
    else:
        raise ValueError(f"unknown init_pos {init_pos!r}")
    return opts


def sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Producer options (flow-log-egress sink — AD.java:170-179)."""
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def iam_auth_options() -> dict[str, str]:
    """SASL/IAM auth properties the reference sets for MSK
    (AnomalyDetection.java:94-99), translated to kafka client configs."""
    return {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "AWS_MSK_IAM",
    }


def read_stream(
    spark: SparkSession, options: dict[str, str]
) -> DataFrame:
    try:
        return spark.readStream.format("kafka").options(**options).load()
    except Exception as e:  # pragma: no cover - needs kafka jar
        raise RuntimeError(
            "kafka connector not on classpath; add spark-sql-kafka to use "
            "a live broker (option dicts are still valid)"
        ) from e


def write_stream(df: DataFrame, options: dict[str, str], checkpoint: str):
    writer = (
        df.writeStream.format("kafka")
        .options(**options)
        .option("checkpointLocation", checkpoint)
    )
    return writer
