"""Streaming CEP-equivalent fragmentation detector.

The Spark-native replacement for the reference's Flink CEP operator
(AnomalyDetection.java:126-167): per key, a run of [min_run, max_run]
low-metric events followed by one high-metric event within the window,
matches non-overlapping (skipPastLastEvent — AD.java:126).

Implementation: ``groupBy(key).applyInPandasWithState`` with O(1) state
per key — no event buffering. The greedy run is folded into running
aggregates (count, matched-count, first/last timestamps, size sum,
first attacker), so state size is independent of run length and the
state store scales with |distinct keys| only.

Equivalence contract: identical output to
``operators.detection.detect_attack_runs`` on the same input (the batch
run-length oracle) — pinned by tests/test_streaming.py. Two deliberate
properties follow from that contract:

- A run ends ONLY at a trigger (high-metric) event, exactly like the
  batch maximal-run rule. There is NO state timeout by default: a GC
  timeout would re-anchor long runs and let later triggers match where
  the batch semantics say no match (state is O(1)/key, so retention cost
  is bounded by key cardinality). An optional processing-time GC timeout
  is available for ops hygiene and mirrors the reference's own
  processing-time pragmatics (AD.java:137) — a documented deviation when
  enabled.
- Within a micro-batch, events are sorted by (event_time, order col);
  cross-batch disorder is late data, dropped by the upstream watermark —
  the same behavior the reference gets from forMonotonousTimestamps
  (AD.java:121-124, zero-lateness watermark).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.timeutil import watermarkable
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("target_key", StringType()),
        StructField("attack_start_time", DoubleType()),
        StructField("attack_end_time", DoubleType()),
        StructField("attacker_id", StringType()),
        StructField("fragment_count", LongType()),
        StructField("avg_packets", DoubleType()),
        StructField("avg_fragment_size", DoubleType()),
        StructField("size_reduction_percent", DoubleType()),
    ]
)

# state: run_count, matched_count, first_ts, last_matched_end, sum_size,
# first_attacker
STATE_SCHEMA = StructType(
    [
        StructField("run_count", LongType()),
        StructField("matched_count", LongType()),
        StructField("first_ts", DoubleType()),
        StructField("last_matched_end", DoubleType()),
        StructField("sum_size", DoubleType()),
        StructField("first_attacker", StringType()),
    ]
)

EMPTY_STATE = (0, 0, 0.0, 0.0, 0.0, "")

# processing-time mode appends the wall-clock instant the open run's
# first event was processed
STATE_SCHEMA_PROC = StructType(
    STATE_SCHEMA.fields + [StructField("first_proc", DoubleType())]
)


def make_detector_fn(
    *,
    low_threshold: float,
    high_threshold: float,
    min_run: int,
    max_run: int,
    window_seconds: float,
    vectorized: bool = True,
    time_mode: str = "event",
    clock=None,
):
    """Build the applyInPandasWithState function for the given pattern
    parameters (reference: 10/10/10-30/60 s — AD.java:126-132).
    ``vectorized=False`` selects the scalar reference state machine.

    ``time_mode``: ``"event"`` (default — deterministic, replayable)
    measures ``within()`` in event time; ``"processing"`` mirrors the
    reference exactly (AD.java:137 ``withinType.PROCESSING_TIME``): a
    partial match older than ``window_seconds`` of WALL CLOCK is pruned
    before the batch is applied — Flink's NFA within-pruning at
    micro-batch granularity (events inside one micro-batch share one
    processing instant, the only granularity micro-batching offers).
    ``clock`` injects a time source for deterministic tests
    (default ``time.time``).
    """
    if time_mode not in ("event", "processing"):
        raise ValueError(f"time_mode must be event|processing, got {time_mode!r}")
    process = _process_batch_vectorized if vectorized else _process_batch_scalar
    proc_mode = time_mode == "processing"
    # in processing mode the event-time within() check is disabled; the
    # wall-clock pruning below enforces the window instead
    eff_window = float("inf") if proc_mode else window_seconds
    if clock is None:
        import time as _time

        clock = _time.time

    def detect(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # optional GC path (only reachable with a timeout configured)
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA.fields])
            return

        now = float(clock()) if proc_mode else 0.0
        first_proc = now
        if proc_mode:
            if state.exists:
                *core, first_proc = state.get
                state_tuple = tuple(core)
            else:
                state_tuple = EMPTY_STATE
            if state_tuple[0] > 0 and now - first_proc > window_seconds:
                # the carried partial match exceeded the processing-time
                # window: prune it (skipPastLastEvent on expiry)
                state_tuple = EMPTY_STATE
            carry_active = state_tuple[0] > 0
            carry_first_ts = state_tuple[2]
        else:
            state_tuple = state.get if state.exists else EMPTY_STATE

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["_ts", "_oid"], kind="mergesort")

        key_str = str(key[0])
        out, state_tuple = process(
            batch,
            state_tuple,
            key_str,
            low_threshold,
            high_threshold,
            min_run,
            max_run,
            eff_window,
        )

        if state_tuple[0] > 0:
            if proc_mode:
                # continued carry-in run keeps its original first-seen
                # instant (same first event ⇒ same first_ts); a run
                # opened in this batch starts its window now
                keep = carry_active and state_tuple[2] == carry_first_ts
                state.update(state_tuple + (first_proc if keep else now,))
            else:
                state.update(state_tuple)
        elif state.exists:
            state.remove()

        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return detect


def _process_batch_scalar(
    batch: pd.DataFrame,
    state_tuple: tuple,
    key_str: str,
    low_threshold: float,
    high_threshold: float,
    min_run: int,
    max_run: int,
    window_seconds: float,
) -> tuple[list[tuple], tuple]:
    """Reference implementation: event-at-a-time state machine. Kept as
    the ground truth the vectorized path is property-tested against."""
    run_count, matched, first_ts, last_end, sum_size, attacker = state_tuple
    out: list[tuple] = []
    for ts, end_ts, metric, size, attk in zip(
        batch["_ts"], batch["_end_ts"], batch["_metric"], batch["_size"],
        batch["_attacker"],
    ):
        if pd.isna(metric) or pd.isna(ts):
            continue
        ts_s = ts.timestamp()
        if metric < low_threshold:  # anomalous fragment (AD.java:127)
            if run_count == 0:
                first_ts = ts_s
                attacker = str(attk)
            run_count += 1
            if run_count <= max_run:  # greedy cap: times(10,30)
                matched += 1
                last_end = end_ts.timestamp() if not pd.isna(end_ts) else ts_s
                sum_size += float(size)
        elif metric > high_threshold:  # back-to-normal trigger (AD.java:130)
            if run_count >= min_run and ts_s - first_ts <= window_seconds:
                avg_size = sum_size / matched
                avg_packets = float(metric)
                out.append(
                    (
                        key_str,
                        first_ts,
                        last_end,
                        attacker,
                        matched,
                        avg_packets,
                        avg_size,
                        (avg_packets - avg_size) / avg_packets * 100.0,
                    )
                )
            # skipPastLastEvent: reset regardless of emit (AD.java:126)
            run_count, matched, first_ts, last_end, sum_size, attacker = EMPTY_STATE
        # metric == thresholds: neutral, ignored (AD.java:127,130)
    return out, (run_count, matched, first_ts, last_end, sum_size, attacker)


def _process_batch_vectorized(
    batch: pd.DataFrame,
    state_tuple: tuple,
    key_str: str,
    low_threshold: float,
    high_threshold: float,
    min_run: int,
    max_run: int,
    window_seconds: float,
) -> tuple[list[tuple], tuple]:
    """NumPy segment-based equivalent of :func:`_process_batch_scalar`.

    Trigger (high-metric) events are the only reset points, so the batch
    splits into segments at trigger positions. Per-segment aggregates of
    the anomalous events come from prefix sums (cumulative count/size and
    k-th-anomalous-index lookups), giving O(n) vectorized work with no
    Python per-event loop. Carry-in state from the previous batch fills
    the head segment; carry-out state is computed from the tail segment.
    Property-tested equal to the scalar reference on random sequences.
    """
    import numpy as np

    run_count, matched, first_ts, last_end, sum_size, attacker = state_tuple

    metric = batch["_metric"].to_numpy(dtype=float)
    valid = ~(np.isnan(metric) | batch["_ts"].isna().to_numpy())
    if not valid.all():
        batch = batch.loc[valid]
        metric = metric[valid]
    n = len(batch)
    if n == 0:
        return [], state_tuple

    ts = batch["_ts"].to_numpy("datetime64[us]").astype("int64") / 1e6
    # NaT does NOT become NaN under datetime64->float casts (it becomes
    # int64-min/1e6 ~= -9.22e12), so mask nulls explicitly before the
    # conversion — matches the scalar reference's pd.isna(end_ts) branch.
    end_isnat = batch["_end_ts"].isna().to_numpy()
    end_raw = batch["_end_ts"].to_numpy("datetime64[us]").astype("int64") / 1e6
    end_s = np.where(end_isnat, ts, end_raw)
    size = np.nan_to_num(batch["_size"].to_numpy(dtype=float), nan=0.0)
    attackers = batch["_attacker"].to_numpy(dtype=object)

    is_a = metric < low_threshold
    is_n = metric > high_threshold
    a = is_a.astype(np.int64)

    # prefix count over anomalous events (index i => count over [0, i])
    cs_count = np.cumsum(a)
    a_pos = np.flatnonzero(is_a)  # cs_count value k is at index a_pos[k-1]
    trig = np.flatnonzero(is_n)

    def seg_stats(lo_count: int, hi_count: int, budget: int, acc: float):
        """Aggregates over anomalous events with cumulative-count in
        (lo_count, hi_count], matched = first `budget` of them. The size
        sum folds sequentially onto ``acc`` (<= max_run adds) so FP
        rounding matches the scalar reference / batch oracle exactly —
        a prefix-sum difference would drift in the last ulp."""
        total = hi_count - lo_count
        take = min(total, max(budget, 0))
        if take <= 0:
            return total, 0, 0.0, 0.0, acc, None
        first_i = a_pos[lo_count]  # (lo_count+1)-th anomalous event
        last_i = a_pos[lo_count + take - 1]
        for v in size[a_pos[lo_count : lo_count + take]]:
            acc += v
        return total, take, ts[first_i], end_s[last_i], acc, attackers[first_i]

    out: list[tuple] = []
    prev_count = 0  # cumulative anomalous count consumed so far
    for t in trig:
        seg_hi = cs_count[t]  # anomalous events before this trigger
        total, take, f_ts, l_end, acc, attk = seg_stats(
            prev_count, seg_hi, max_run - matched, sum_size
        )
        if run_count == 0 and total > 0:
            first_ts, attacker = f_ts, str(attk)
        run_count += total
        if take > 0:
            matched += take
            last_end = l_end
            sum_size = acc
        if run_count >= min_run and ts[t] - first_ts <= window_seconds:
            avg_size = sum_size / matched
            avg_packets = float(metric[t])
            out.append(
                (
                    key_str,
                    first_ts,
                    last_end,
                    attacker,
                    matched,
                    avg_packets,
                    avg_size,
                    (avg_packets - avg_size) / avg_packets * 100.0,
                )
            )
        run_count, matched, first_ts, last_end, sum_size, attacker = EMPTY_STATE
        prev_count = seg_hi

    # tail segment after the last trigger -> carry-out state
    total, take, f_ts, l_end, acc, attk = seg_stats(
        prev_count, cs_count[-1] if n else 0, max_run - matched, sum_size
    )
    if total > 0:
        if run_count == 0:
            first_ts, attacker = f_ts, str(attk)
        run_count += total
        if take > 0:
            matched += take
            last_end = l_end
            sum_size = acc
    return out, (run_count, matched, first_ts, last_end, sum_size, attacker)


def detect_attack_runs_stream(
    events: DataFrame,
    *,
    key_col: str,
    time_col: str,
    order_col: str,
    metric_col: str,
    low_threshold: float,
    high_threshold: float,
    min_run: int,
    max_run: int,
    window_seconds: float,
    size_expr=None,
    end_time_col: str | None = None,
    attacker_col: str | None = None,
    watermark: str = "0 seconds",
    gc_timeout: bool = False,
    time_mode: str = "event",
    clock=None,
) -> DataFrame:
    """Streaming twin of ``operators.detection.detect_attack_runs``.

    ``watermark`` mirrors the reference's zero-lateness monotonous
    watermark (AD.java:121-124); raise it to tolerate disorder.
    ``time_mode="processing"`` selects the reference's processing-time
    ``within()`` (AD.java:137) — see :func:`make_detector_fn`; the
    event-time default is the documented deterministic deviation
    (SURVEY §7.4.2).
    """
    from pyspark.sql import functions as F

    size = size_expr if size_expr is not None else F.col(metric_col)
    end_time = F.col(end_time_col) if end_time_col else F.col(time_col)
    attacker = F.col(attacker_col) if attacker_col else F.col(order_col)

    # watermark AFTER the projection so only _ts carries event-time
    # metadata (aliasing a watermarked column twice would create two
    # event-time columns and fail the stateful operator). Event-time
    # columns cast through TIMESTAMP: watermarks reject TIMESTAMP_NTZ
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and the cast is an identity
    # for already-tz-aware input under the engine's UTC session tz.
    prepared = events.select(
        F.col(key_col).cast("string").alias("_key"),
        watermarkable(F.col(time_col)).alias("_ts"),
        F.col(order_col).alias("_oid"),
        F.col(metric_col).cast("double").alias("_metric"),
        size.cast("double").alias("_size"),
        watermarkable(end_time).alias("_end_ts"),
        attacker.cast("string").alias("_attacker"),
    ).withWatermark("_ts", watermark)
    fn = make_detector_fn(
        low_threshold=low_threshold,
        high_threshold=high_threshold,
        min_run=min_run,
        max_run=max_run,
        window_seconds=window_seconds,
        time_mode=time_mode,
        clock=clock,
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if gc_timeout
        else GroupStateTimeout.NoTimeout
    )
    state_schema = STATE_SCHEMA_PROC if time_mode == "processing" else STATE_SCHEMA
    return prepared.groupBy("_key").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, state_schema, "append", timeout
    )


def detect_fragmentation_flowlogs_stream(
    events: DataFrame,
    watermark: str = "0 seconds",
    time_mode: str = "event",
    clock=None,
) -> DataFrame:
    """Reference-exact streaming specialization (Event schema, ip_dst key,
    packets thresholds, bytes/packets fragment size — AD.java:126-167).
    ``time_mode="processing"`` reproduces the reference's wall-clock
    within() (AD.java:137)."""
    from pyspark.sql import functions as F

    out = detect_attack_runs_stream(
        events,
        key_col="ip_dst",
        time_col="event_time",
        order_col="timestamp_start",
        metric_col="packets",
        low_threshold=10,
        high_threshold=10,
        min_run=10,
        max_run=30,
        window_seconds=60.0,
        size_expr=F.col("bytes").cast("double") / F.col("packets"),
        end_time_col="event_time_end",
        attacker_col="ip_src",
        watermark=watermark,
        time_mode=time_mode,
        clock=clock,
    )
    return out.withColumnRenamed("target_key", "target_ip")
