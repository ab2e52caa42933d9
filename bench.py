"""Benchmark harness: runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver collect cost); a
warmup pass primes the JVM/codegen so timings reflect steady-state plans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spot_anomalies_flink_workshop_resources_spark.plans import harness
from spot_anomalies_flink_workshop_resources_spark.session import build_session


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = harness.build_queries()
    # warmup at the smallest sf: JVM codegen (q1), Python worker pool +
    # Arrow serde (simhash_packed), and streaming/state-store machinery
    # (cep stream) — otherwise whichever query sorts first absorbs those
    # one-time costs and the per-query numbers misattribute them
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for wname in (
        "q1_pricing_summary",
        "dedup_simhash_packed",
        "cep_fragmentation_stream",
    ):
        if wname in queries:
            run_query(spark, queries[wname], warm_dir)

    timings: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        timings[name] = round(run_query(spark, fn, sf_dir), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
