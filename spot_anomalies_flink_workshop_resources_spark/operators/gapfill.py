"""Time-series gap-fill: dense bucket spine + last-observation-carried-
forward (LOCF) interpolation — the hypertable/monitoring rollup shape
(`time_bucket_gapfill` in timescale-style engines).

The reference job emits per-attack aggregates on a sparse event stream
(AD.java:140-167); any dashboard or model-feature consumer downstream
needs the DENSE series — every bucket present, gaps filled — which no
reference operator provides. This operator closes that gap for the
batch surface.

Scale design:
- The raw-events aggregation is the only data-sized stage (one shuffle
  on (event_type, bucket), map-side partials).
- The spine is generated from ONE min/max row (sequence + explode) and
  cross-joined with the distinct key set — spine size is
  time_range/granularity x |keys|, orders of magnitude smaller than
  the input at 100 TB; the join against the bucket aggregates is
  grid-sized, never raw-data-sized.
- LOCF runs as a window over the DENSE AGGREGATED grid partitioned by
  key and ordered by bucket — per-key state is #buckets, bounded by
  the time range, not by event volume. Keys with few distinct values
  would skew the window only if the grid itself were huge; for
  monitoring-style key cardinalities this is the standard plan.

Exactness: the per-bucket average goes through the exact decimal-sum /
count route (see plans/relational._davg) so both engines fill
bit-identical doubles forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _davg(col):
    dec = F.col(col).cast("decimal(18,4)")
    return (
        F.sum(dec).cast("string").cast("double") / F.count(col)
    )


def gapfill_locf(events: DataFrame, granularity: str = "hour") -> DataFrame:
    """Dense per-(event_type, bucket) series with LOCF-filled averages.

    Output: (event_type, bucket, n_events, avg_value, filled_value,
    is_gap) — n_events = 0 and avg_value NULL on gap rows;
    filled_value carries the last non-null average forward (NULL only
    before a key's first observation).
    """
    b = events.groupBy(
        F.date_trunc(granularity, F.col("ts")).alias("bucket"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _davg("value").alias("avg_value"),
    )
    spine = (
        b.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            F.explode(
                F.expr(f"sequence(mn, mx, interval 1 {granularity})")
            ).alias("bucket")
        )
    )
    grid = events.select("event_type").distinct().crossJoin(spine)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            "avg_value",
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


def gapfill_locf_sql(granularity: str = "hour") -> str:
    """DuckDB value oracle: independent spine generation + IGNORE NULLS
    window fill."""
    return f"""
WITH b AS (
  SELECT date_trunc('{granularity}', ts) AS bucket, event_type,
         COUNT(*) AS n_events,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
           / COUNT(value) AS avg_value
  FROM events
  GROUP BY 1, 2
),
r AS (SELECT MIN(bucket) AS mn, MAX(bucket) AS mx FROM b),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 {granularity})) AS bucket
  FROM r
),
grid AS (
  SELECT t.event_type, s.bucket
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN spine s
)
SELECT g.event_type, g.bucket,
       COALESCE(b.n_events, 0) AS n_events,
       b.avg_value AS avg_value,
       last_value(b.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       b.n_events IS NULL AS is_gap
FROM grid g
LEFT JOIN b ON b.event_type = g.event_type AND b.bucket = g.bucket
"""
