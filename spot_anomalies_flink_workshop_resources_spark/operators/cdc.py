"""CDC log compaction: last-writer-wins snapshot with deletes.

The lakehouse upsert primitive (what Delta/Hudi MERGE compaction
computes): given a change log of (key, ordering, op, payload) rows,
produce the current snapshot — per key, the row with the highest
ordering wins; if that row is a delete, the key disappears.

Pure built-in expressions: one hash exchange on the key, a row_number
window, a filter. At 100 TB the log is typically bucketed/partitioned
by key at write time, which turns the exchange into a local sort —
same plan shape as any keyed dedup. Deterministic for any total
``order_cols`` (callers include a unique tiebreaker).

No reference analogue (beyond-reference surface per BASELINE.json).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_log(
    log: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str,
    delete_value: str = "delete",
) -> DataFrame:
    """Latest-row-per-key snapshot honoring deletes.

    ``order_cols`` must totally order rows within a key (include a
    unique id as the last column); the highest-ordered row decides the
    key's fate: kept with its payload, or dropped if its ``op_col``
    equals ``delete_value``. A NULL op is treated as an upsert (the
    common CDC convention: op absent on plain inserts) — without the
    coalesce, ``NULL != 'delete'`` would evaluate NULL and silently
    delete the key.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.coalesce(F.col(op_col) != delete_value, F.lit(True)))
        .drop("_rn")
    )


def compact_log_stream(
    log: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str,
    delete_value: str = "delete",
) -> DataFrame:
    """Streaming twin of :func:`compact_log` — the continuously
    maintained upsert view, expressed as a COMPLETE-output-mode
    aggregation: per key, ``max_by`` of the payload under the ordering
    struct (incrementally maintained state, one row per key), with
    delete-op rows filtered from the emitted snapshot.

    Unlike the engine's append-mode queries, complete mode re-emits the
    whole (key-sized) result each trigger — the right contract for a
    materialized snapshot view. State is O(|keys|); a bounded
    run-to-completion equals the batch compaction, which is how the
    harness oracle checks it. Output schema matches :func:`compact_log`
    exactly (all log columns, ``op_col`` included), so the two forms
    are drop-in interchangeable; NULL ops upsert, as in the batch form.
    """
    payload_cols = [c for c in log.columns if c not in key_cols]
    ordering = F.struct(*[F.col(c) for c in order_cols])
    snap = log.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max_by(F.struct(*payload_cols), ordering).alias("_latest")
    )
    return snap.select(*key_cols, "_latest.*").where(
        F.coalesce(F.col(op_col) != delete_value, F.lit(True))
    )


def compact_log_sql(
    table: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_expr: str,
    delete_value: str = "delete",
    select_cols: Sequence[str] | None = None,
) -> str:
    """DuckDB twin. ``op_expr`` is the SQL expression for the op column
    (lets the harness derive an op from existing columns)."""
    keys = ", ".join(key_cols)
    order = ", ".join(f"{c} DESC" for c in order_cols)
    cols = ", ".join(select_cols) if select_cols else "*"
    return f"""
WITH ranked AS (
  SELECT {cols}, {op_expr} AS _op,
         ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY {order}) AS _rn
  FROM {table}
)
SELECT {cols} FROM ranked
WHERE _rn = 1 AND COALESCE(_op <> '{delete_value}', TRUE)
"""


def scd2_history(
    log: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str,
    delete_value: str = "delete",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from a CDC change log —
    the dimension-table twin of :func:`compact_log`: instead of keeping
    only each key's latest row, every upsert becomes a VERSION row
    valid from its own ordering position until the key's next change
    (``valid_to``); a delete closes the current version without
    opening a new one, and the open-ended row is flagged
    ``is_current``. This is what a Delta/Hudi MERGE with
    whenMatched-expire semantics materializes for point-in-time joins.

    One key-partitioned ``lead`` window — the exact exchange the
    compaction already pays, so SCD2 costs no more than the snapshot.
    ``order_cols`` must totally order rows within a key (include a
    unique id last); ``valid_to`` is the next change's first order
    column. NULL ops upsert, as in :func:`compact_log`.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        log.withColumn("valid_to", F.lead(order_cols[0]).over(w))
        .where(F.coalesce(F.col(op_col) != delete_value, F.lit(True)))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_history_sql(
    table: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_expr: str,
    delete_value: str = "delete",
    select_cols: Sequence[str] | None = None,
) -> str:
    """DuckDB twin of :func:`scd2_history` (same conventions as
    :func:`compact_log_sql`)."""
    keys = ", ".join(key_cols)
    order = ", ".join(order_cols)
    cols = ", ".join(select_cols) if select_cols else "*"
    # With select_cols=None the outer projection must not re-emit the
    # CTE's helper _op column or duplicate valid_to — EXCLUDE both.
    outer = cols if select_cols else "* EXCLUDE (_op, valid_to)"
    return f"""
WITH versioned AS (
  SELECT {cols}, {op_expr} AS _op,
         LEAD({order_cols[0]}) OVER (
           PARTITION BY {keys} ORDER BY {order}) AS valid_to
  FROM {table}
)
SELECT {outer}, valid_to, (valid_to IS NULL) AS is_current
FROM versioned
WHERE COALESCE(_op <> '{delete_value}', TRUE)
"""


def changelog_agg(log: DataFrame, key_cols, order_cols, op_col: str,
                  group_col: str, value_col: str,
                  delete_value: str = "delete") -> DataFrame:
    """Incremental aggregate maintenance from a CDC change log — the
    retraction-stream algebra (Flink changelog / Delta incremental
    view): every op emits +1 row for its new state and a retraction
    row (-1, -prev value) for the state it replaces; summing the
    deltas telescopes per key to the LIVE state's contribution, so the
    result equals aggregating the compacted snapshot without ever
    materializing it.

    Handles group TRANSITIONS (an update that changes ``group_col``
    retracts under the old group and asserts under the new one) and
    delete/re-insert sequences (state after a delete is absent, so the
    next upsert retracts nothing).

    Scale shape: one key-ordered window (lag) + narrow delta explode
    (≤2 rows/op) + one hash agg on the group key — no join against the
    snapshot, which is the point: at 100 TB the log delta for a day is
    tiny relative to the accumulated snapshot, and this plan touches
    only the log. Value deltas go through decimal(18,4) so retractions
    cancel EXACTLY (float retraction would drift).

    Output: (group, n_live, sum_live) for groups with live rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    dec = F.col(value_col).cast("decimal(18,4)")
    # window pass first (generators cannot host window expressions),
    # then the narrow delta explode over the materialized lag columns
    lagged = log.select(
        F.col(op_col),
        F.col(group_col),
        dec.alias("_v"),
        F.lag(op_col).over(w).alias("_pop"),
        F.lag(group_col).over(w).alias("_pg"),
        F.lag(dec).over(w).alias("_pv"),
    )
    assertion = F.when(
        F.col(op_col) != delete_value,
        F.struct(
            F.col(group_col).alias("g"),
            F.lit(1).alias("dn"),
            F.col("_v").alias("dv"),
        ),
    )
    retraction = F.when(
        F.coalesce(F.col("_pop") != delete_value, F.lit(False)),
        F.struct(
            F.col("_pg").alias("g"),
            F.lit(-1).alias("dn"),
            (-F.col("_pv")).alias("dv"),
        ),
    )
    deltas = (
        lagged.select(F.explode(F.array(assertion, retraction)).alias("d"))
        .where(F.col("d").isNotNull())
        .select("d.g", "d.dn", "d.dv")
    )
    return (
        deltas.groupBy(F.col("g").alias(group_col))
        .agg(
            F.sum("dn").cast("long").alias("n_live"),
            F.sum("dv").cast("string").cast("double").alias("sum_live"),
        )
        .where(F.col("n_live") > 0)
    )
