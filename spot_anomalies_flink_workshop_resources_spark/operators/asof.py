"""As-of (most-recent-prior) join — a time-series operator Spark lacks.

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
