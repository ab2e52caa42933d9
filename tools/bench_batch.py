"""Batch-path data-bound throughput benchmark.

The per-query bench at sf0.1 measures Spark's fixed job machinery
(SCALE.md "what the local bench can and cannot show"); this tool
measures the part that actually scales with data: it synthesizes N
events IN the executors (spark.range + column expressions — no
parquet, no driver materialization), runs the flagship batch detector
over them, and prints one JSON line:

  {"rows": N, "wall_sec": s, "rows_per_sec": r, "alerts": k}

Event shape mirrors the harness events table; every 1000-row block per
key embeds one detectable run (3 low values then a high trigger) so
the emit path does real work. Usage:

  python tools/bench_batch.py [n_rows] [n_keys]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.operators import detection
from spot_anomalies_flink_workshop_resources_spark.session import build_session


def synth_events(spark, n_rows: int, n_keys: int):
    """N events over n_keys users, ~1 event/user/minute, value pattern
    embedding a (3 low, 1 high) detectable run at the head of every
    1000-row block per user — all generated executor-side."""
    # per-user sequence position (user = id % n_keys, so a user's k-th
    # event has id = user + k*n_keys): pattern indexes k, not id
    pos_in_block = (F.col("id") / n_keys).cast("long") % 1000
    value = (
        F.when(pos_in_block < 3, 5.0)            # anomalous run (<10)
        .when(pos_in_block == 3, 25.0)           # trigger (>20)
        .otherwise(12.0 + (F.col("id") % 7))     # neutral 12..18
    )
    return spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(1704067200000000) + (F.col("id") / n_keys).cast("long") * 60_000_000)
        ).alias("ts"),
        (F.col("id") % n_keys).alias("user_id"),
        F.lit("view").alias("event_type"),
        value.alias("value"),
        F.lit("{}").alias("props"),
    )


def synth_join_agg(spark, n_fact: int, n_dim: int):
    """Shuffle-path workload: n_fact fact rows joined to an n_dim
    dimension too large to broadcast, then a grouped aggregate — the
    orders x lineitem shape, fully synthesized executor-side."""
    fact = spark.range(n_fact).select(
        (F.col("id") % n_dim).alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"),
        (F.col("id") % 25).alias("grp"),
    )
    return (
        fact.join(dim.hint("shuffle_hash"), "k")
        .groupBy("grp")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = build_session()
    events = synth_events(spark, n_rows, n_keys)
    params = dict(
        key_col="user_id",
        time_col="ts",
        order_col="event_id",
        metric_col="value",
        low_threshold=10.0,
        high_threshold=20.0,
        min_run=2,
        max_run=5,
        window_seconds=7 * 24 * 3600.0,
    )
    # warm codegen/JVM with a tiny run so the measurement is steady-state
    detection.detect_attack_runs(
        synth_events(spark, 10_000, 100), **params
    ).count()
    t0 = time.time()
    alerts = detection.detect_attack_runs(events, **params).count()
    wall = time.time() - t0
    # shuffle path: same row count through a non-broadcast join + agg
    synth_join_agg(spark, 100_000, 10_000).collect()  # warm
    t1 = time.time()
    groups = len(synth_join_agg(spark, n_rows, n_rows // 10).collect())
    jwall = time.time() - t1
    print(
        json.dumps(
            {
                "rows": n_rows,
                "n_keys": n_keys,
                "wall_sec": round(wall, 2),
                "rows_per_sec": int(n_rows / wall),
                "alerts": alerts,
                "join_wall_sec": round(jwall, 2),
                "join_rows_per_sec": int(n_rows / jwall),
                "join_groups": groups,
            }
        )
    )


if __name__ == "__main__":
    main()
