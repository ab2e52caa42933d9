"""Pipeline-tail sinks (reference S5-S7, W7-W9).

The reference fans alerts out of Kafka through Lambdas: Firehose/S3
archival (publish_firehose_function.py:14-35 with an identity transform,
parse_json.js:3-13), and an LLM/notification consumer with throttle
retries and a severity gate
(invoke_agent/summarization.py:56-134, mcp_server/server.py:16-34,
action_group.py:139-155). In the engine these are writeStream file sinks
and ``foreachBatch`` hooks — the micro-batch IS the reference's
≤1000-record / ≤60 s event-source batch (code_stack.py:432-435)."""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def archive_writer(results: DataFrame, path: str, checkpoint: str, fmt: str = "json"):
    """S6/S7: archival sink (replaces the Kafka→Firehose→S3 relay; the
    Firehose transform is identity, so this is a straight file sink)."""
    return (
        results.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def with_retries(
    fn: Callable[[], object],
    max_attempts: int = 3,
    base_sleep: Callable[[int], float] = lambda n: 2**n + 1,
    retryable: tuple[type[Exception], ...] = (Exception,),
    sleep=time.sleep,
):
    """W8 retry policy: up to 3 attempts, backoff 2^n + 1 s on throttle
    (invoke_agent/summarization.py:56-90)."""
    last: Exception | None = None
    for attempt in range(max_attempts):
        try:
            return fn()
        except retryable as e:  # noqa: PERF203
            last = e
            if attempt < max_attempts - 1:
                sleep(base_sleep(attempt))
    raise last  # type: ignore[misc]


# The reference's consumer is invoked with at most 1000 records per
# batch (MSK event source mapping: batch_size=1000, max window 60 s —
# code/code_stack.py:432-434). The engine tails mirror that cap.
MAX_CONSUMER_BATCH = 1000


def iter_record_chunks(df: DataFrame, max_records: int = MAX_CONSUMER_BATCH):
    """W7 batch-cap parity: stream a micro-batch to the driver in
    chunks of at most ``max_records`` rows.

    ``toLocalIterator`` holds at most one partition in driver memory at
    a time, so an oversized alert batch is chunked like the reference's
    ≤1000-record consumer invocations instead of being silently
    collected whole. Alerts are low-volume by construction, but the cap
    is what makes that an invariant rather than an assumption.
    """
    chunk: list = []
    for row in df.toLocalIterator():
        chunk.append(row)
        if len(chunk) >= max_records:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def severity_gate(batch: DataFrame, min_severity: int = 2) -> DataFrame:
    """W9: notify only for severity >= 2 (mcp_server/server.py:20,
    action_group.py:141). Severity arrives as a string field."""
    return batch.where(F.col("severity").cast("int") >= min_severity)


def notification_foreach_batch(
    notify: Callable[[dict], None],
    min_severity: int = 2,
    max_attempts: int = 3,
    sleep=time.sleep,
):
    """Build a foreachBatch(fn) tail: filter by severity, then call
    ``notify(record)`` per alert with the W8 retry policy. The external
    call stays driver-side plain Python, exactly like the reference's
    Lambda consumer (per-record HTTP with backoff)."""

    def _tail(batch: DataFrame, epoch_id: int) -> None:
        for rows in iter_record_chunks(severity_gate(batch, min_severity)):
            for row in rows:
                rec = row.asDict()
                with_retries(
                    lambda r=rec: notify(r), max_attempts=max_attempts, sleep=sleep
                )

    return _tail
