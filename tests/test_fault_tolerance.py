"""Fault-tolerance and data-layout behaviors the 100 TB story rests on:
streaming checkpoint/restart without duplicate or lost output (the
engine-side equivalent of the Flink job's checkpointing), and
partitioned-parquet layout with partition pruning at the scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def test_streaming_checkpoint_resume_exactly_once(spark, tmp_path):
    """Stop a checkpointed streaming query, add more input, restart with
    the SAME checkpoint: already-committed input must not re-emit, new
    input must appear — the file sink's transactional log + source
    offsets in the checkpoint give end-to-end exactly-once."""
    from spot_anomalies_flink_workshop_resources_spark.streaming.sinks import (
        archive_writer,
    )

    src = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_batch(name, id0, n):
        p = src / name
        with open(p, "w") as f:
            for i in range(id0, id0 + n):
                f.write(json.dumps({"event_id": i, "payload": f"p{i}"}) + "\n")
        # deterministic batch order for the file source
        os.utime(p, (id0, id0))

    def run_once():
        stream = spark.readStream.schema("event_id LONG, payload STRING").json(
            str(src)
        )
        q = archive_writer(stream, out, ckpt).start()
        q.processAllAvailable()
        q.stop()

    write_batch("a.json", 0, 20)
    run_once()
    first = spark.read.json(out).count()
    assert first == 20

    write_batch("b.json", 1000, 30)
    run_once()  # restart from the same checkpoint

    rows = spark.read.json(out).select("event_id").collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == 50, f"expected 50 rows exactly-once, got {len(ids)}"
    assert len(set(ids)) == 50, "duplicate emission after restart"
    assert set(ids) == set(range(20)) | set(range(1000, 1030))


def test_partitioned_parquet_write_and_partition_pruning(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout: partitionBy at write, and a
    partition-key predicate at read resolves via PartitionFilters
    (pruned at planning — files of other partitions are never listed
    into the scan), not a data filter."""
    from spot_anomalies_flink_workshop_resources_spark.catalog import load_table

    path = str(tmp_path / "events_by_type")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").partitionBy("event_type").parquet(path)

    # layout: one directory per partition value
    dirs = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert len(dirs) >= 3

    df = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:200]
    assert "event_type" in pf, f"partition predicate not pruned: {pf}"

    expected = events.where(F.col("event_type") == "click").count()
    assert df.count() == expected
