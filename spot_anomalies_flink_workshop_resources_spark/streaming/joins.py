"""Stream-stream event-time interval join (SURVEY.md §2.6 surface).

The reference's Flink job keeps one keyed stream (AnomalyDetection.java
keyBy at :126), but a production replacement needs the two-stream
correlation primitive Flink calls an *interval join*: match rows of two
streams on a key where the right event time falls inside a bounded
range after the left event time. Structured Streaming expresses this as
an inner equi-join plus event-time range predicates; the watermarks on
BOTH inputs are what let the engine bound the join state (each side's
buffered rows are dropped once the other side's watermark passes the
range), so state stays O(range x rate) instead of growing forever —
the property that makes this safe on an unbounded 100 TB/day stream.

Inner-join matches are emitted as soon as both rows are present
(watermarks gate only state eviction and outer-null emission), so a
run-to-completion over a bounded source equals the batch join — which
is exactly how the harness oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import watermarkable


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Inner interval join: right rows with
    ``left_ts + lower <= right_ts <= left_ts + upper`` for the same key.

    Both inputs must carry distinct column names apart from ``key``;
    the output keeps all columns of both sides.
    """
    # watermarks require TIMESTAMP (not NTZ); identity cast otherwise
    left = left.withColumn(left_ts, watermarkable(F.col(left_ts)))
    right = right.withColumn(right_ts, watermarkable(F.col(right_ts)))
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} + INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{key}"))


def interval_join_stream_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """LEFT OUTER interval join: like :func:`interval_join_stream`, but
    a left row with no in-range right row eventually emits once with
    nulls — WHEN the watermark passes the end of its join window (the
    engine can only then prove no future match exists; this is the
    state-eviction moment, so outer state stays bounded exactly like
    the inner join's).

    Finalization contract for bounded runs (what the harness oracle
    encodes): matched pairs emit as both sides arrive, regardless of
    position; null rows emit only for left rows whose window CLOSED
    strictly before the final watermark (left_ts + upper < max event
    time seen) — trailing unmatched rows near the end of input remain
    in state and do not emit. The same max(ts)-based filter the
    session-window oracle uses, applied to outer-null rows."""
    left = left.withColumn(left_ts, watermarkable(F.col(left_ts)))
    right = right.withColumn(right_ts, watermarkable(F.col(right_ts)))
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} + INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + INTERVAL {upper}"))
    )
    return l.join(r, cond, "leftOuter").drop(F.col(f"r.{key}"))


def interval_join_stream_right(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """RIGHT OUTER interval join: a right row with no in-range left row
    eventually emits once with nulls — when the watermark passes the
    LATEST left event time that could still match it (``right_ts -
    lower``; matching lefts live in ``[right_ts - upper, right_ts -
    lower]`` and future rows sit above the watermark).

    Finalization contract for bounded runs (the oracle's filter):
    null rows only for right rows with ``right_ts - lower`` strictly
    below the final global watermark (min of the two sides' max event
    times); trailing unmatched right rows stay in state."""
    left = left.withColumn(left_ts, watermarkable(F.col(left_ts)))
    right = right.withColumn(right_ts, watermarkable(F.col(right_ts)))
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} + INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + INTERVAL {upper}"))
    )
    return l.join(r, cond, "rightOuter").drop(F.col(f"l.{key}"))


def interval_join_stream_full(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """FULL OUTER interval join — both outer contracts at once: an
    unmatched left row null-emits when the watermark passes its window
    end (``left_ts + upper``), an unmatched right row when it passes
    ``right_ts - lower``. The key column is coalesced across sides so
    unmatched rows from either side carry it."""
    left = left.withColumn(left_ts, watermarkable(F.col(left_ts)))
    right = right.withColumn(right_ts, watermarkable(F.col(right_ts)))
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} + INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + INTERVAL {upper}"))
    )
    j = l.join(r, cond, "fullOuter")
    lcols = [c for c in left.columns if c != key]
    rcols = [c for c in right.columns if c != key]
    return j.select(
        F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key),
        *[F.col(f"l.{c}") for c in lcols],
        *[F.col(f"r.{c}") for c in rcols],
    )


def interval_join_stream_semi(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """LEFT SEMI interval join (native stream-stream leftSemi): each
    left row emits AT MOST ONCE, when its first in-range right row
    arrives — the "which clicks converted" stream. State bounds match
    the inner join's (watermark evicts closed windows); no null
    emission, so no finalization subtlety: the bounded-run result is
    exactly the EXISTS filter."""
    left = left.withColumn(left_ts, watermarkable(F.col(left_ts)))
    right = right.withColumn(right_ts, watermarkable(F.col(right_ts)))
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} + INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + INTERVAL {upper}"))
    )
    return l.join(r, cond, "leftSemi")


def interval_join_stream_anti(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """LEFT ANTI interval join — the abandonment stream (left rows
    whose window closed with NO in-range right row). Structured
    Streaming has no native stream-stream leftAnti, so this derives it
    the only watermark-sound way: the LEFT OUTER join's null rows ARE
    the anti set (they emit exactly when the watermark proves no match
    can arrive), filtered and projected back to the left columns.
    Finalization contract: rows only for left windows that closed
    strictly before the final global watermark — identical boundary to
    the outer join's null emission."""
    probe = f"__anti_{right_ts}"
    outer = interval_join_stream_left(
        left,
        right.select(F.col(key), F.col(right_ts).alias(probe)),
        key=key,
        left_ts=left_ts,
        right_ts=probe,
        lower=lower,
        upper=upper,
        watermark=watermark,
    )
    return outer.where(F.col(probe).isNull()).select(
        *[F.col(f"l.{c}") for c in left.columns]
    )
