"""Streaming patterns beyond the detector: stream-static dimension join
and streaming deduplication (training pipelines dedupe streams too)."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F


def _write_jsonl(rows):
    d = tempfile.mkdtemp(prefix="spat_")
    with open(f"{d}/data.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return d


def test_stream_static_broadcast_join(spark):
    """Streaming events enriched from a static dimension — the streaming
    equivalent of the replay generator's J2 lookup."""
    events = [{"writer_id": f"eni-{i % 3}", "n": i} for i in range(30)]
    d = _write_jsonl(events)
    stream = (
        spark.readStream.schema("writer_id STRING, n LONG")
        .json(d)
    )
    dim = spark.createDataFrame(
        [("eni-0", "vpc-a"), ("eni-1", "vpc-b")], ["writer_id", "vpc"]
    )
    joined = stream.join(F.broadcast(dim), "writer_id", "left")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM ssj_out")
    assert out.count() == 30
    assert out.where(F.col("vpc") == "vpc-a").count() == 10
    assert out.where(F.col("vpc").isNull()).count() == 10  # eni-2 unmatched


def test_streaming_dedup_by_key(spark):
    """dropDuplicates on a stream: each event_id delivered twice (the
    at-least-once story), exactly one survives."""
    rows = [{"event_id": i, "payload": f"p{i}"} for i in range(50)]
    d = _write_jsonl(rows + rows)  # duplicate delivery
    stream = spark.readStream.schema("event_id LONG, payload STRING").json(d)
    deduped = stream.dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM dedup_out")
    assert out.count() == 50
    assert out.select("event_id").distinct().count() == 50
    assert {r.payload for r in out.collect()} == {f"p{i}" for i in range(50)}
