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


NORM_BITS = 8  # per-dim resolution of the balanced (range-normalized) key


def zorder_events_balanced(events: DataFrame) -> DataFrame:
    """Range-normalized Z-order key over (user_id, event day) — the
    production layout form (what Delta's OPTIMIZE ZORDER BY computes
    via range binning): each dimension is first mapped onto an
    equal-width 2^NORM_BITS bucket grid between its min and max, THEN
    interleaved, so both dimensions contribute equally-significant bits
    regardless of their raw ranges. Without this, a dimension with more
    varying bits (here user_id, 8 bits vs the month's 5 day bits)
    dominates the key's high positions and the other dimension prunes
    poorly (measured: a day predicate hit 16/24 files unbalanced vs
    6/24 balanced — `tests/test_zorder.py`).

    Bucketing uses pure integer arithmetic ((v - lo) * 2^bits integer-
    divided by (hi - lo + 1)) so Spark and the DuckDB oracle cannot
    disagree on a boundary; the min/max bounds come from one broadcast
    aggregate (one extra corpus pass, same as any range layout write).

    Output: (event_id, user_id, day_num, zval); the layout write is
    ``repartitionByRange(n, "zval").sortWithinPartitions("zval")``.
    """
    day = F.floor(
        F.col("ts").cast("timestamp").cast("double") / F.lit(86400.0)
    ).cast("long")
    dims = events.select("event_id", "user_id", day.alias("day_num"))
    bounds = dims.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.min("day_num").alias("dlo"),
        F.max("day_num").alias("dhi"),
    )
    n = 1 << NORM_BITS
    joined = dims.crossJoin(F.broadcast(bounds))
    x = F.expr(f"((user_id - ulo) * {n}) div (uhi - ulo + 1)")
    y = F.expr(f"((day_num - dlo) * {n}) div (dhi - dlo + 1)")
    return joined.select(
        "event_id",
        "user_id",
        "day_num",
        morton_interleave(x, y, NORM_BITS).alias("zval"),
    )


def zorder_events_balanced_sql() -> str:
    n = 1 << NORM_BITS
    interleave = morton_interleave_sql("x", "y", NORM_BITS)
    return f"""
WITH dims AS (
  SELECT event_id, user_id,
         CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 86400.0) AS BIGINT) AS day_num
  FROM events
),
bounds AS (
  SELECT MIN(user_id) AS ulo, MAX(user_id) AS uhi,
         MIN(day_num) AS dlo, MAX(day_num) AS dhi
  FROM dims
),
norm AS (
  SELECT event_id, user_id, day_num,
         ((user_id - ulo) * {n}) // (uhi - ulo + 1) AS x,
         ((day_num - dlo) * {n}) // (dhi - dlo + 1) AS y
  FROM dims, bounds
)
SELECT event_id, user_id, day_num, CAST({interleave} AS BIGINT) AS zval
FROM norm
"""


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
