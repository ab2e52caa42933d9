"""Streaming-detector throughput benchmark.

Generates N normal events + B fragmentation bursts (each followed by a
closing normal event on the same target, so the emit path runs), streams
them through the stateful detector, and prints one JSON line:
{"events": N, "wall_sec": s, "events_per_sec": r, "alerts": k}.

Target (BASELINE.md): sustain >= 10,000 ev/s on the local harness.
Note: the reference's own producer pools make normal ip_dst and attack
ip_dst disjoint (normal_events_producer.py:28-34 vs
fragmentation_attack/lambda_handler.py:31-45), so without injected
closers its pattern completes only via replay traffic — the closers here
stand in for that.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.session import build_session
from spot_anomalies_flink_workshop_resources_spark.sources import generators
from spot_anomalies_flink_workshop_resources_spark.streaming.detector import (
    detect_fragmentation_flowlogs_stream,
)


def closer_for(burst, ts):
    ms = int(ts * 1000)
    return burst.limit(1).select(
        F.lit("GET").alias("event_type"),
        F.lit("1.2.3.4").alias("ip_src"),
        F.col("ip_dst"),
        F.lit("443").alias("port_src"),
        F.lit("8080").alias("port_dst"),
        F.lit("TCP").alias("ip_proto"),
        F.lit(ms).alias("timestamp_start"),
        F.lit(ms + 10).alias("timestamp_end"),
        F.timestamp_micros(F.lit(ms * 1000)).alias("event_time"),
        F.timestamp_micros(F.lit((ms + 10) * 1000)).alias("event_time_end"),
        F.lit(250).cast("long").alias("packets"),
        F.lit(9000).cast("long").alias("bytes"),
        F.lit("eni-x").alias("writer_id"),
        F.lit("ok").alias("text"),
    )


def measure(
    spark,
    n_normal: int,
    n_bursts: int,
    tag: str = "out",
    hot_key_frac: float = 0.0,
) -> dict:
    """One sustained-rate run of parse->detect->serialize: returns
    {"events", "wall_sec", "events_per_sec", "alerts"}. Dataset prep
    (generate + write parquet) is excluded from the timed window.

    ``hot_key_frac`` > 0 reroutes that fraction of normal events onto a
    SINGLE ip_dst (the attack shape: one victim absorbing ~half the
    stream, VERDICT r6 #7) — the detector keys state by ip_dst, so the
    hot key concentrates one state partition's work and measures
    throughput under the skew the batch twin (cep_fragmentation_skew)
    splits explicitly."""
    normal = generators.normal_traffic_batch(
        spark, n_normal, start_ts=1.7e9, events_per_second=5000
    )
    if hot_key_frac > 0.0:
        normal = normal.withColumn(
            "ip_dst",
            F.when(
                F.rand(seed=7) < F.lit(hot_key_frac), F.lit("10.99.99.99")
            ).otherwise(F.col("ip_dst")),
        )
    parts = [normal]
    for i in range(n_bursts):
        t = 1.7e9 + i * 1.0
        b = generators.attack_burst(spark, 50, start_ts=t, seed=i)
        parts += [b, closer_for(b, t + 5)]
    events = functools.reduce(lambda a, b: a.unionByName(b), parts)

    d = tempfile.mkdtemp(prefix="bench_stream_")
    events.write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    total = spark.read.parquet(d).count()

    stream = spark.readStream.schema(schema).format("parquet").load(d)
    alerts = detect_fragmentation_flowlogs_stream(stream)
    name = f"bench_stream_{tag}"
    t0 = time.time()
    q = (
        alerts.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    wall = time.time() - t0
    n_alerts = spark.table(name).count()
    return {
        "events": total,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(total / wall),
        "alerts": n_alerts,
    }


def main() -> None:
    n_normal = int(os.environ.get("BENCH_STREAM_EVENTS", "200000"))
    n_bursts = int(os.environ.get("BENCH_STREAM_BURSTS", "40"))
    spark = build_session("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(measure(spark, n_normal, n_bursts)))
    spark.stop()


if __name__ == "__main__":
    main()
