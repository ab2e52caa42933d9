"""Ordered-funnel and cohort-retention analytics over an event stream.

The reference's CEP operator (AD.java:126-132) matches one temporal
pattern per key; funnels are the product-analytics generalization —
how many users complete stage1 -> stage2 -> stage3 IN ORDER — and
cohort retention is its longitudinal cousin (of the users who first
appeared in week W, how many were active in week W+k). Both are
standard consumers of the same keyed event table.

Scale design:

- Funnel: per-user stage timestamps are stacked window minima over ONE
  hash partitioning (partition by user) — Spark plans a single
  exchange and evaluates all three window frames on it; the final
  stage rollup reduces to |stages| rows. No joins, no second shuffle
  of raw events.
- Retention: first-event cohort is one user-keyed aggregation; the
  join back to events is on the same user key (co-partitioned
  shuffle), and the (cohort, offset) rollup is calendar-bounded —
  weeks x weeks, tiny. At 100 TB both stages are plain hash
  aggregations; no window over unbounded partitions.

Determinism: counts and integer week arithmetic only — no floats
anywhere, so the oracles are bit-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FUNNEL_STAGES: tuple[str, ...] = ("view", "click", "purchase")


def funnel(
    events: DataFrame, stages=FUNNEL_STAGES, within: str | None = None
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches stage k when an event of
    type stages[k] exists STRICTLY AFTER their stage k-1 time (first
    qualifying occurrence; ties on equal timestamps do not advance).
    With ``within`` (an INTERVAL string, e.g. "1 hour"), each stage
    must additionally occur no later than the previous stage's time
    plus the window — the conversion-deadline form product funnels
    actually use.

    Output: (stage_idx, stage, n_users), n_users non-increasing in
    stage_idx.
    """
    w = Window.partitionBy("user_id")
    cur = events.select("user_id", "event_type", "ts")
    # chained withColumn: each stage's window min may reference the
    # previous stage's column; all frames share ONE user_id
    # partitioning, so Catalyst plans a single exchange with stacked
    # Window operators (pinned in tests/test_scale_patterns.py)
    for i, s in enumerate(stages):
        cond = F.col("event_type") == s
        if i > 0:
            cond = cond & (F.col("ts") > F.col(f"t{i - 1}"))
            if within is not None:
                cond = cond & (
                    F.col("ts") <= F.expr(f"t{i - 1} + INTERVAL {within}")
                )
        cur = cur.withColumn(f"t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
    proj = cur.groupBy("user_id").agg(
        *[F.min(f"t{i}").alias(f"t{i}") for i in range(len(stages))]
    )
    counts = proj.agg(
        *[
            F.count(F.col(f"t{i}")).cast("long").alias(f"c{i}")
            for i in range(len(stages))
        ]
    )
    # melt the one-row counts with explode instead of a UNION of
    # per-stage selects — a union would re-plan (and re-scan) the whole
    # pipeline once per stage
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"c{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counts.select(F.explode(pairs).alias("r")).select(
        "r.stage_idx", "r.stage", "r.n_users"
    )


def funnel_sql(stages=FUNNEL_STAGES, within: str | None = None) -> str:
    # window aliases cannot reference each other in one SELECT:
    # chain one CTE per stage, same shape as the engine's withColumns
    ctes = ["base AS (SELECT user_id, event_type, ts FROM events)"]
    prev_cte = "base"
    for i, s in enumerate(stages):
        cond = f"event_type = '{s}'"
        if i > 0:
            cond += f" AND ts > t{i - 1}"
            if within is not None:
                cond += f" AND ts <= t{i - 1} + INTERVAL {within}"
        ctes.append(
            f"s{i} AS (SELECT *, MIN(CASE WHEN {cond} THEN ts END) "
            f"OVER (PARTITION BY user_id) AS t{i} FROM {prev_cte})"
        )
        prev_cte = f"s{i}"
    per_user = (
        "per_user AS (SELECT user_id, "
        + ", ".join(f"MIN(t{i}) AS t{i}" for i in range(len(stages)))
        + f" FROM {prev_cte} GROUP BY user_id)"
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS stage_idx, '{s}' AS stage, "
        f"CAST(COUNT(t{i}) AS BIGINT) AS n_users FROM per_user"
        for i, s in enumerate(stages)
    )
    return "WITH " + ",\n".join(ctes + [per_user]) + "\n" + unions


def retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each (cohort_week, week_offset) the count of
    cohort users active in that later week.

    Output: (cohort_week, week_offset, n_active_users) with
    week_offset >= 0; offset 0 row counts the full cohort.
    """
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    offset = (
        F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        act.join(first, "user_id")
        .select("cohort_week", offset.alias("week_offset"), "user_id")
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active_users
FROM act a JOIN first f ON f.user_id = a.user_id
GROUP BY 1, 2
"""
