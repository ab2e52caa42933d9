"""Temporal joins Spark lacks: as-of (most-recent-prior) and a
bucketized batch interval join.

``asof_join(left, right)``: for every left row, attach the latest right
row with the same key whose timestamp is <= the left timestamp.

Spark-first formulation (no merge_asof UDF, no range explosion): tag and
UNION the two inputs, then one window pass per key ordered by
(ts, side-tag) carrying the last-seen right payload forward
(``last(..., ignorenulls=True)``), then keep left rows. The left row's
own columns travel through the union, so no id-stability assumptions
are needed. Cost: ONE shuffle on the key — the same price as a plain
equi-join — and the plan is pure built-ins (whole-stage codegen).

Tie semantics: the right-side tag (0) sorts before the left's (1) at
equal timestamps, so a right row at exactly left_ts matches — standard
ASOF <= semantics, identical to DuckDB's native ASOF JOIN, which the
harness uses as the oracle.

At 100 TB: scales as a single repartition by key; skewed keys degrade
like any windowed op (salting does not apply — order matters within a
key), so the practical mitigation is splitting a hot key's history by
coarse time bucket and stitching boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import col_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_order: str | None = None,
) -> DataFrame:
    """Full left row + ``asof_<col>`` columns from the most recent right
    row (right_ts <= left_ts) per key; nulls where no prior right row.

    ``right_order`` breaks ties among right rows sharing the same
    (key, right_ts): the row with the GREATEST order value wins. When
    omitted, the struct of ``value_cols`` is the tiebreaker — still
    deterministic (greatest value tuple wins) but semantically arbitrary,
    so callers with duplicate (key, ts) right rows should pass an
    explicit order column. Without this the window ordered only by
    (_t, _side) and ``last(ignorenulls=True)`` picked whichever
    duplicate happened to sort last — plan-dependent output.
    """
    left_cols = left.columns
    tie = (
        F.col(right_order)
        if right_order is not None
        else F.struct(*[F.col(c) for c in value_cols])
    )
    rtag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        tie.alias("_ro"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left_cols
        ],
    )
    ltag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtag.schema["_ro"].dataType).alias("_ro"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
            for c in value_cols
        ],
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", F.col("_ro").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = rtag.unionByName(ltag).select(
        "_side",
        *[F.col(f"_l_{c}") for c in left_cols],
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("_side") == 1).drop("_side")
    for c in left_cols:
        out = out.withColumnRenamed(f"_l_{c}", c)
    return out


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Batch interval join — each left row matches same-key right rows
    with ``left_ts + lower <= right_ts <= left_ts + upper`` — executed
    as an EQUI-join on (key, time_bucket) instead of an equi-join on
    key alone with a range post-filter.

    Why: Spark plans the naive formulation as a join on ``key`` whose
    range predicate only filters AFTER pairing, so every same-key
    (left, right) pair materializes — O(|L_k|·|R_k|) per key, quadratic
    on hot keys regardless of how narrow the time window is. Bucketizing
    adds the time dimension to the join key: left rows replicate to the
    ceil(range/bucket)+1 buckets their window overlaps (bounded, known
    replication), right rows hash to exactly one bucket, and the exact
    range predicate refines pairs that share a bucket. A hot key's work
    drops from |L_k|·|R_k| to pairs-per-overlapping-bucket — the same
    bucket trick the skew-split detector uses, applied to joins.

    Each matching (left, right) pair shares exactly the right row's one
    bucket, so no post-join dedup is needed. Default bucket width is the
    window span (replication factor ~2). Streaming twin:
    ``streaming.joins.interval_join_stream`` (same semantics, state
    bounded by watermarks); both check against the same plain-SQL
    interval-join oracle.
    """
    if bucket_seconds is None:
        bucket_seconds = max(upper_seconds - lower_seconds, 1.0)
    # type-agnostic epoch seconds (TIMESTAMP, TIMESTAMP_NTZ, or numeric)
    lsec = col_seconds(left, left_ts)
    rsec = col_seconds(right, right_ts)
    lo = F.floor((lsec + lower_seconds) / bucket_seconds).cast("long")
    hi = F.floor((lsec + upper_seconds) / bucket_seconds).cast("long")
    l = left.withColumn("_b", F.explode(F.sequence(lo, hi)))
    r = right.withColumn("_b", F.floor(rsec / bucket_seconds).cast("long"))
    a, b = l.alias("a"), r.alias("b")
    _lts_is_ts = dict(left.dtypes)[left_ts].startswith("timestamp")
    _rts_is_ts = dict(right.dtypes)[right_ts].startswith("timestamp")
    ats = F.col(f"a.{left_ts}")
    ats = ats.cast("timestamp").cast("double") if _lts_is_ts else ats.cast("double")
    bts = F.col(f"b.{right_ts}")
    bts = bts.cast("timestamp").cast("double") if _rts_is_ts else bts.cast("double")
    joined = a.join(
        b,
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col("a._b") == F.col("b._b"))
        & (bts >= ats + lower_seconds)
        & (bts <= ats + upper_seconds),
    )
    keep = [F.col(f"a.{c}") for c in left.columns] + [
        F.col(f"b.{c}") for c in right.columns if c != key
    ]
    return joined.select(*keep)
