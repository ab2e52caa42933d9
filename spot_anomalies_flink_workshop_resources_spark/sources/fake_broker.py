"""File-backed fake Kafka broker with the exact connector wire contract.

The environment has no broker, no spark-sql-kafka jar, and no network,
so the live S1/S5 path cannot run (documented in COVERAGE.md). This
module closes the gap the honest way: a directory-backed "broker" whose
read side presents EXACTLY the Spark Kafka source schema

    key binary, value binary, topic string, partition int,
    offset long, timestamp timestamp, timestampType int

and whose write side consumes EXACTLY the Kafka sink contract (a
``value`` column, optional ``key``/``partition``), assigning per-
partition monotonically increasing offsets. Swapping it for the real
connector is a one-line change in the pipeline wiring
(``kafka.read_stream``/``write_stream`` with the same option builders),
which is the point: the full reference loop
Kafka -> deserialize -> CEP -> serialize -> Kafka
(AnomalyDetection.java:116-181) runs end-to-end against it in tests,
including the epoch-second AttackResult JSON contract the downstream
consumers rely on (invoke_agent/summarization.py:20-28).

Storage format: JSON-lines files per topic, values/keys base64-encoded
(JSON cannot carry raw bytes) — consumers therefore do
``json.loads(base64.b64decode(...))``, the reference consumer's own
decode path (publish_firehose_function.py:27-28).

Semantics notes (deviations documented):
- partitioning: hash(key) mod n when a key exists, else a deterministic
  hash of the value (real Kafka: murmur2 keyed / sticky round-robin);
- delivery: at-least-once on producer retry (offsets re-derived per
  call), matching the reference pipeline's effective guarantee;
- only earliest-offset consumption (TRIM_HORIZON — code_stack.py:436),
  which is what every reference consumer uses.
"""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# storage-file schema (b64 strings; decoded to the wire schema on read)
_FILE_SCHEMA = (
    "key_b64 string, value_b64 string, topic string, partition int, "
    "offset long, ts_ms long"
)

KAFKA_SOURCE_COLUMNS = [
    "key", "value", "topic", "partition", "offset", "timestamp",
    "timestampType",
]


class FileFakeBroker:
    def __init__(self, root: str, n_partitions: int = 3):
        self.root = root
        self.n_partitions = n_partitions
        os.makedirs(root, exist_ok=True)

    def _topic_dir(self, topic: str) -> str:
        d = os.path.join(self.root, topic)
        os.makedirs(d, exist_ok=True)
        return d

    # ---- producer side (S5 contract) ------------------------------------
    def produce(self, batch: DataFrame, topic: str) -> int:
        """Kafka sink contract: ``value`` required (string/binary),
        ``key`` and ``partition`` optional. Assigns per-partition
        contiguous offsets continuing from the topic's current end."""
        spark = batch.sparkSession
        d = self._topic_dir(topic)
        cols = set(batch.columns)
        if "value" not in cols:
            raise ValueError("kafka sink contract requires a 'value' column")
        key = (F.col("key") if "key" in cols else F.lit(None)).cast("binary")
        if "partition" in cols:
            part = F.col("partition").cast("int")
        else:
            by_key = F.pmod(F.xxhash64(key), F.lit(self.n_partitions))
            by_value = F.pmod(
                F.xxhash64(F.col("value").cast("binary")),
                F.lit(self.n_partitions),
            )
            part = (
                F.when(key.isNotNull(), by_key).otherwise(by_value).cast("int")
            )
        out = batch.select(
            key.alias("_k"),
            F.col("value").cast("binary").alias("_v"),
            part.alias("partition"),
        )
        # current end offsets (small: one row per partition)
        ends = {p: -1 for p in range(self.n_partitions)}
        existing = self._read_files(spark, topic)
        if existing is not None:
            for r in (
                existing.groupBy("partition").agg(F.max("offset").alias("m")).collect()
            ):
                ends[r["partition"]] = r["m"]
        base = F.create_map(
            *[F.lit(x) for p in range(self.n_partitions) for x in (p, ends[p] + 1)]
        )
        from pyspark.sql import Window

        w = Window.partitionBy("partition").orderBy(F.monotonically_increasing_id())
        rows = out.withColumn("_rn", F.row_number().over(w)).select(
            F.base64(F.col("_k")).alias("key_b64"),
            F.base64(F.col("_v")).alias("value_b64"),
            F.lit(topic).alias("topic"),
            "partition",
            (F.col("_rn").cast("long") - 1 + base[F.col("partition")]).alias(
                "offset"
            ),
            (F.unix_timestamp(F.current_timestamp()) * 1000).alias("ts_ms"),
        )
        n = rows.count()
        rows.write.mode("append").json(d)
        return n

    # ---- consumer side (S1/S2 contract) ----------------------------------
    def _read_files(self, spark: SparkSession, topic: str):
        d = self._topic_dir(topic)
        if not any(f.endswith(".json") for f in os.listdir(d)):
            return None
        return spark.read.schema(_FILE_SCHEMA).json(d)

    @staticmethod
    def _to_wire(df: DataFrame) -> DataFrame:
        return df.select(
            F.unbase64(F.col("key_b64")).alias("key"),
            F.unbase64(F.col("value_b64")).alias("value"),
            "topic",
            "partition",
            "offset",
            F.timestamp_millis(F.col("ts_ms")).alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )

    def read_batch(self, spark: SparkSession, topic: str) -> DataFrame:
        """Batch read from earliest — the Kafka source schema exactly."""
        df = self._read_files(spark, topic)
        if df is None:
            df = spark.createDataFrame([], _FILE_SCHEMA)
        return self._to_wire(df)

    def read_stream(self, spark: SparkSession, topic: str) -> DataFrame:
        """Streaming read from earliest (TRIM_HORIZON), Kafka schema."""
        d = self._topic_dir(topic)
        return self._to_wire(
            spark.readStream.schema(_FILE_SCHEMA).json(d)
        )

    def sink(self, topic: str, checkpoint: str):
        """Kafka-sink stand-in for ``start_pipeline``: a builder taking
        the payload stream and returning a DataStreamWriter that
        produces every micro-batch into the topic."""

        def build(df: DataFrame):
            return (
                df.writeStream.outputMode("append")
                .option("checkpointLocation", checkpoint)
                .foreachBatch(lambda b, _eid: self.produce(b, topic))
            )

        return build

    # ---- reference-consumer decode path ----------------------------------
    def consume_values(self, spark: SparkSession, topic: str) -> list[dict]:
        """Decode all values like the reference consumers do:
        json.loads(base64.b64decode(record)) — ordered by (partition,
        offset)."""
        rows = (
            self._read_files(spark, topic)
            .orderBy("partition", "offset")
            .select("value_b64")
            .collect()
            if self._read_files(spark, topic) is not None
            else []
        )
        return [
            json.loads(base64.b64decode(r["value_b64"]).decode("utf-8"))
            for r in rows
        ]
