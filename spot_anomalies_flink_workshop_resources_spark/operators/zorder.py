"""Z-order (Morton) clustering keys for multi-dimensional data layout.

The lakehouse layout primitive: interleaving the bits of two scan
dimensions gives a single sort key under which a range of either
dimension maps to O(sqrt) contiguous key ranges — so writing files
sorted/range-partitioned by the z-value lets BOTH ``WHERE user = ?``
and ``WHERE day = ?`` scans prune most files, where a plain sort on one
column only serves that column. This is what Delta/Iceberg expose as
``OPTIMIZE ... ZORDER BY``; here it is an engine operator:
``zorder_key`` computes the value, ``repartitionByRange(zval)`` (the
caller's one extra line) is the layout step.

The bit interleave is compile-time unrolled into plain integer
arithmetic (shift/and/or are exact in both engines), generated from one
spec so the Spark expression and the DuckDB oracle SQL cannot drift.
Scale shape: a narrow per-row map — the layout write's range exchange
is the only shuffle, identical to any sorted write.

No reference analogue (beyond-reference surface per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16  # per dimension -> 32-bit z-value


def morton_interleave(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative longs: bit i of x
    lands at position 2i, bit i of y at 2i+1."""
    terms = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        t = xb.bitwiseOR(yb)
        terms = t if terms is None else terms.bitwiseOR(t)
    return terms


def morton_interleave_sql(x: str, y: str, bits: int = DEFAULT_BITS) -> str:
    """The identical interleave as DuckDB SQL (shared spec — see module
    docstring)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)


def zorder_events(events: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Z-order key for the events table over (user_id, event day):
    per-event z-value plus the range bucket a ``repartitionByRange``
    layout write would place it in (fixed-width buckets over the
    2^(2*bits) key space — deterministic, unlike sampled range bounds).
    """
    x = (F.col("user_id").cast("long")).bitwiseAND(F.lit((1 << DEFAULT_BITS) - 1))
    day = F.floor(
        F.col("ts").cast("timestamp").cast("double") / F.lit(86400.0)
    ).cast("long")
    y = day.bitwiseAND(F.lit((1 << DEFAULT_BITS) - 1))
    zval = morton_interleave(x, y)
    width = (1 << (2 * DEFAULT_BITS)) // n_buckets
    return events.select(
        "event_id",
        "user_id",
        day.alias("day_num"),
        zval.alias("zval"),
        F.floor(zval / F.lit(float(width))).cast("long").alias("z_bucket"),
    )


def zorder_events_sql(n_buckets: int = 64) -> str:
    width = (1 << (2 * DEFAULT_BITS)) // n_buckets
    interleave = morton_interleave_sql("x", "y")
    return f"""
WITH dims AS (
  SELECT event_id, user_id,
         CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 86400.0) AS BIGINT) AS day_num,
         user_id & {(1 << DEFAULT_BITS) - 1} AS x,
         CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 86400.0) AS BIGINT)
           & {(1 << DEFAULT_BITS) - 1} AS y
  FROM events
)
SELECT event_id, user_id, day_num,
       CAST({interleave} AS BIGINT) AS zval,
       CAST(FLOOR(CAST({interleave} AS BIGINT) / {float(width)!r}) AS BIGINT)
         AS z_bucket
FROM dims
"""
