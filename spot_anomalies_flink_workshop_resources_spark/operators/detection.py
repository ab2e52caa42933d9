"""Batch CEP-equivalent fragmentation-attack detection.

Reference semantics (AnomalyDetection.java:126-167): per key (``ip_dst``),
a run of ``times(10,30)`` events with ``packets < 10`` followed by exactly
one event with ``packets > 10``, first-to-last span within 60 s, matches
non-overlapping (``AfterMatchSkipStrategy.skipPastLastEvent()``,
AnomalyDetection.java:126). Events with ``packets == 10`` match neither
predicate (AnomalyDetection.java:127,130) and are neutral/skipped
(relaxed contiguity of ``followedBy``).

Spark-first formulation — ONE shuffle total:

1. classify each event A (anomalous) / N (normal), drop neutral rows
   (filter reaches the parquet scan);
2. run-length encode per key: ``lag`` + cumulative ``sum`` of
   phase-change flags over ``Window.partitionBy(key).orderBy(time, id)``
   — the only hash exchange in the plan;
3. aggregate one row per (key, run_id). HashPartitioning(key) satisfies
   the ClusteredDistribution of (key, run_id), so NO second shuffle;
4. runs strictly alternate A,N,A,N within a key (a run boundary IS a
   phase change), so the trigger ("normal") event of a match is simply
   the NEXT run — ``lead()`` over (key, run_id), again no shuffle and no
   self-join;
5. filter: run length in [min_run, ∞), next run is N, trigger time within
   the window of the first matched event. Greedy cap: only the first
   ``max_run`` events of a longer run are "matched" (the NFA consumes up
   to 30 then waits for the N trigger; later A events are interleaved
   ignorables under relaxed contiguity).

Non-overlap (skipPastLastEvent) holds by construction: maximal runs are
disjoint and each match consumes one A-run plus the head of the following
N-run.

At 100 TB: the single exchange partitions by the detection key (high
cardinality — one partition per hash bucket of ip_dst/user_id); window +
agg + lead all pipeline within that partitioning, and the classify filter
prunes the scan to only anomalous/trigger rows before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import col_seconds


def detect_attack_runs(
    df: DataFrame,
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
    size_expr: Column | None = None,
    end_time_col: str | None = None,
    attacker_col: str | None = None,
) -> DataFrame:
    """Generic run-length attack detector.

    Args:
        df: input events.
        key_col: partition key (reference: ``ip_dst`` — AD.java:136), or
            a LIST of columns for a composite key: windows partition on
            the plain columns (reusing any existing hash partitioning
            on them) and ``target_key`` becomes a struct of them.
        time_col: event-time column (timestamp type).
        order_col: deterministic tiebreaker within equal timestamps.
        metric_col: column classified against the thresholds
            (reference: ``packets`` — AD.java:127,130).
        low_threshold: anomalous iff metric < low (AD.java:127).
        high_threshold: trigger iff metric > high (AD.java:130).
        min_run/max_run: ``times(min,max)`` bounds (AD.java:128).
        window_seconds: ``within()`` span, event-time (AD.java:132; the
            reference matches in processing time — documented deviation,
            SURVEY.md §7.4.2: event time is deterministic and testable).
        size_expr: per-event expression averaged over matched anomalous
            events (reference: ``bytes/packets`` — AD.java:150); defaults
            to the metric column.
        end_time_col: column giving an event's end time for
            ``attack_end_time`` (reference: ``timestamp_end`` —
            AD.java:159); defaults to ``time_col``.
        attacker_col: column reported as attacker id from the first
            matched event (reference: ``ip_src`` — AD.java:160); defaults
            to the order column.

    Returns one row per match:
        target_key, attack_start_time, attack_end_time, attacker_id,
        fragment_count, avg_packets, avg_fragment_size,
        size_reduction_percent — formulas per AttackResult
        (AD.java:157-166).
    """
    size_expr = size_expr if size_expr is not None else F.col(metric_col)
    attacker = F.col(attacker_col) if attacker_col else F.col(order_col)

    # key_col may be a composite (list of columns): windows then
    # partition on the PLAIN columns — so an input that is already
    # hash-partitioned on them (e.g. the skew twin's checkpointed
    # (_key, _bucket) frame) satisfies the window's distribution with
    # NO new exchange, where a struct-valued key would force one — and
    # target_key is emitted as a struct of the original names.
    key_names = [key_col] if isinstance(key_col, str) else list(key_col)
    key_aliases = [f"_gk{i}" for i in range(len(key_names))]
    ts, oid, metric = (
        F.col(time_col),
        F.col(order_col),
        F.col(metric_col),
    )

    # null event times are dropped (as in the skew-split twin): an
    # event-time detector cannot order them, and the reference null-guards
    # the event-time extraction the same way (Event.java:59-61). Keeping
    # the filter identical in both twins preserves their "same output,
    # any input" equivalence contract (ADVICE r2).
    #
    # Event times convert to fractional epoch seconds HERE (type-agnostic:
    # TIMESTAMP, TIMESTAMP_NTZ, or already-numeric — the skew twin feeds
    # pre-converted doubles): ordering by the double is identical to
    # ordering by the timestamp, and no later stage needs a timestamp cast
    # (TIMESTAMP_NTZ cannot cast to DOUBLE at all).
    ts_sec = col_seconds(df, time_col)
    end_sec = (
        col_seconds(df, end_time_col) if end_time_col else ts_sec
    )
    classified = df.where(
        ((metric < low_threshold) | (metric > high_threshold)) & ts.isNotNull()
    ).select(
        *[F.col(n).alias(a) for n, a in zip(key_names, key_aliases)],
        ts_sec.alias("_ts"),
        oid.alias("_oid"),
        metric.alias("_metric"),
        size_expr.cast("double").alias("_size"),
        end_sec.alias("_end_ts"),
        attacker.cast("string").alias("_attacker"),
        F.when(metric < low_threshold, F.lit("A")).otherwise(F.lit("N")).alias("_phase"),
    )

    w = Window.partitionBy(*key_aliases).orderBy("_ts", "_oid")
    runs = (
        classified.withColumn("_prev_phase", F.lag("_phase").over(w))
        .withColumn(
            "_new_run",
            F.when(
                F.col("_prev_phase").isNull()
                | (F.col("_phase") != F.col("_prev_phase")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_run_id", F.sum("_new_run").over(w))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*key_aliases, "_run_id").orderBy("_ts", "_oid")
            ),
        )
    )

    matched = F.col("_rn") <= F.lit(max_run)
    per_run = runs.groupBy(*key_aliases, "_run_id").agg(
        F.first("_phase").alias("_phase"),
        F.count(F.lit(1)).alias("_run_len"),
        F.sum(F.when(matched, 1).otherwise(0)).cast("long").alias("_frag_count"),
        F.min("_ts").alias("_first_ts"),
        # end time of the LAST matched event in (ts, oid) order — the
        # reference takes last.getTsEnd() (AD.java:159), which differs
        # from MAX(end_ts) when flow end times are non-monotone
        # (overlapping flows); keeps batch == streaming scalar twin.
        F.max_by("_end_ts", F.when(matched, F.struct("_ts", "_oid"))).alias(
            "_last_matched_end"
        ),
        F.avg(F.when(matched, F.col("_size"))).alias("_avg_size"),
        F.min_by("_attacker", F.struct("_ts", "_oid")).alias("_first_attacker"),
        F.min_by("_metric", F.struct("_ts", "_oid")).alias("_first_metric"),
    )

    wr = Window.partitionBy(*key_aliases).orderBy("_run_id")
    paired = (
        per_run.withColumn("_next_phase", F.lead("_phase").over(wr))
        .withColumn("_next_first_ts", F.lead("_first_ts").over(wr))
        .withColumn("_next_first_metric", F.lead("_first_metric").over(wr))
    )

    # _first_ts/_next_first_ts are already fractional epoch seconds
    window_ok = (
        F.col("_next_first_ts") - F.col("_first_ts")
    ) <= F.lit(float(window_seconds))

    avg_packets = F.col("_next_first_metric").cast("double")
    target_key = (
        F.col(key_aliases[0])
        if len(key_aliases) == 1
        else F.struct(
            *[F.col(a).alias(n) for n, a in zip(key_names, key_aliases)]
        )
    )
    result = (
        paired.where(
            (F.col("_phase") == "A")
            & (F.col("_next_phase") == "N")
            & (F.col("_run_len") >= F.lit(min_run))
            & window_ok
        )
        .select(
            target_key.alias("target_key"),
            F.col("_first_ts").alias("attack_start_time"),
            F.col("_last_matched_end").alias("attack_end_time"),
            F.col("_first_attacker").alias("attacker_id"),
            F.col("_frag_count").alias("fragment_count"),
            avg_packets.alias("avg_packets"),
            F.col("_avg_size").alias("avg_fragment_size"),
            (
                (avg_packets - F.col("_avg_size")) / avg_packets * F.lit(100.0)
            ).alias("size_reduction_percent"),
        )
    )
    return result


def detect_fragmentation_flowlogs(events: DataFrame) -> DataFrame:
    """Reference-exact specialization on the flow-log Event schema.

    packets<10 run of 10-30, then packets>10, within 60 s per ip_dst
    (AnomalyDetection.java:126-132); avg_fragment_size = mean of
    per-event bytes/packets ratios (AD.java:149-151), avg_packets = mean
    packets of the trigger events (AD.java:153-155), attack_end_time =
    timestamp_end of the LAST anomalous event (AD.java:159).
    """
    out = detect_attack_runs(
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
    )
    return out.withColumnRenamed("target_key", "target_ip")


def oracle_sql_attack_runs(
    *,
    table: str,
    key_col: str,
    time_col: str,
    order_col: str,
    metric_col: str,
    low_threshold: float,
    high_threshold: float,
    min_run: int,
    max_run: int,
    window_seconds: float,
) -> str:
    """ANSI-SQL twin of :func:`detect_attack_runs` for the DuckDB oracle.

    Same five stages expressed as CTEs; used by the driver's correctness
    gate and by tests as an independent formulation.
    """
    return f"""
WITH classified AS (
  SELECT {key_col} AS k, {time_col} AS ts, {order_col} AS oid,
         {metric_col} AS metric,
         CAST({metric_col} AS DOUBLE) AS size,
         CASE WHEN {metric_col} < {low_threshold} THEN 'A' ELSE 'N' END AS phase
  FROM {table}
  WHERE ({metric_col} < {low_threshold} OR {metric_col} > {high_threshold})
    AND {time_col} IS NOT NULL
),
lagged AS (
  SELECT *, LAG(phase) OVER (PARTITION BY k ORDER BY ts, oid) AS prev_phase
  FROM classified
),
runs AS (
  SELECT *, SUM(CASE WHEN prev_phase IS NULL OR phase <> prev_phase
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY k ORDER BY ts, oid
                  ROWS UNBOUNDED PRECEDING) AS run_id
  FROM lagged
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY k, run_id ORDER BY ts, oid) AS rn
  FROM runs
),
per_run AS (
  SELECT k, run_id,
         MIN(phase) AS phase,
         COUNT(*) AS run_len,
         SUM(CASE WHEN rn <= {max_run} THEN 1 ELSE 0 END) AS frag_count,
         MIN(ts) AS first_ts,
         ARG_MAX(ts, CASE WHEN rn <= {max_run} THEN rn END)
           AS last_matched_ts,
         AVG(CASE WHEN rn <= {max_run} THEN size END) AS avg_size,
         ARG_MIN(oid, rn) AS first_oid,
         ARG_MIN(metric, rn) AS first_metric
  FROM ranked
  GROUP BY k, run_id
),
paired AS (
  SELECT *,
         LEAD(phase) OVER (PARTITION BY k ORDER BY run_id) AS next_phase,
         LEAD(first_ts) OVER (PARTITION BY k ORDER BY run_id) AS next_first_ts,
         LEAD(first_metric) OVER (PARTITION BY k ORDER BY run_id) AS next_first_metric
  FROM per_run
)
SELECT k AS target_key,
       CAST(EXTRACT(EPOCH FROM first_ts) AS DOUBLE) AS attack_start_time,
       CAST(EXTRACT(EPOCH FROM last_matched_ts) AS DOUBLE) AS attack_end_time,
       CAST(first_oid AS VARCHAR) AS attacker_id,
       CAST(frag_count AS BIGINT) AS fragment_count,
       CAST(next_first_metric AS DOUBLE) AS avg_packets,
       avg_size AS avg_fragment_size,
       (next_first_metric - avg_size) / next_first_metric * 100.0
         AS size_reduction_percent
FROM paired
WHERE phase = 'A' AND next_phase = 'N' AND run_len >= {min_run}
  AND EXTRACT(EPOCH FROM next_first_ts) - EXTRACT(EPOCH FROM first_ts)
      <= {window_seconds}
"""


def detect_attack_runs_skew_split(
    df: DataFrame,
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
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Hot-key-safe twin of :func:`detect_attack_runs` (same output, any
    input): the per-key event history is split into coarse time buckets
    so one hot key's events spread over many tasks, then runs spanning
    bucket boundaries are stitched with O(1)-bounded carry state.

    Why this is exact: after the FIRST trigger inside a bucket the state
    machine has reset, so everything from that point on is
    carry-independent — those alerts are literally
    ``detect_attack_runs`` re-run with (key, bucket) as the composite
    key over the post-first-trigger events. Only the HEAD segment
    (anomalous events before a bucket's first trigger) interacts with
    carry-in, and its effect is capped by ``max_run``: each bucket
    exports one bounded summary row (counts, first-event info,
    ≤``max_run`` ordered sizes/end-times via ``collect_list`` slices,
    and the post-last-trigger carry-out scalars), all in JVM built-ins.
    The per-key stitch then walks B ≈ span/bucket_seconds tiny rows in
    ``applyInPandas`` — |keys| groups, not |keys×buckets| (an earlier
    per-(key,bucket) Python formulation spent 3 ms/group of Arrow
    overhead on 38k groups; this shape is ~40× faster at sf0.1).

    This is the skew mitigation promised in SCALE.md for the detection
    family (salting cannot apply: order matters within a key).
    Equivalence to the one-shot operator is pinned by randomized and
    boundary-crafted tests plus the shared DuckDB oracle.
    """
    import pandas as pd

    size_expr = size_expr if size_expr is not None else F.col(metric_col)
    attacker = F.col(attacker_col) if attacker_col else F.col(order_col)
    key, ts, oid, metric = (
        F.col(key_col), F.col(time_col), F.col(order_col), F.col(metric_col),
    )
    # epoch-seconds conversion up front (type-agnostic, see
    # detect_attack_runs): _ts is a double from here on, so bucketing,
    # the sub-detection, and the stitch all avoid timestamp casts
    ts_sec = col_seconds(df, time_col)
    end_sec = col_seconds(df, end_time_col) if end_time_col else ts_sec
    classified = df.where(
        ((metric < low_threshold) | (metric > high_threshold))
        & metric.isNotNull() & ts.isNotNull()
    ).select(
        key.alias("_key"),
        ts_sec.alias("_ts"),
        oid.alias("_oid"),
        metric.cast("double").alias("_metric"),
        size_expr.cast("double").alias("_size"),
        F.coalesce(end_sec, ts_sec).alias("_end_s"),
        attacker.cast("string").alias("_attacker"),
        F.floor(ts_sec / F.lit(float(bucket_seconds))).alias("_bucket"),
    )

    w_kb = Window.partitionBy("_key", "_bucket").orderBy("_ts", "_oid")
    w_all = Window.partitionBy("_key", "_bucket")
    is_n = F.col("_metric") > high_threshold
    ev = (
        classified.withColumn("_pos", F.row_number().over(w_kb))
        .withColumn(
            "_fnp", F.min(F.when(is_n, F.col("_pos"))).over(w_all)
        )
        .withColumn(
            "_lnp", F.max(F.when(is_n, F.col("_pos"))).over(w_all)
        )
    )
    # The two consumers below each embed this subplan. Deliberately NO
    # localCheckpoint: under AQE a checkpointed RDD scans back as
    # unknown-partitioned, so BOTH branches re-shuffled the full event
    # frame through fresh (key,bucket) exchanges (measured 3.2 s at
    # sf0.1); lazily duplicating the subplan instead lets every
    # downstream window/aggregate satisfy its distribution from its own
    # branch's single exchange — one shuffle per branch, no
    # materialization job, 2.5 s. At 100 TB, materialize ev ONCE into a
    # (key,bucket)-bucketed staging table (or DISK_ONLY persist, which
    # preserves partitioning) rather than recompute the classify scan
    # twice — the right trade flips when the scan is petabytes.

    # ---- carry-independent alerts: the one-shot operator itself, keyed
    # by (key, bucket), over events strictly after the bucket's first
    # trigger (the state machine reset there)
    # composite (plain-column) key: the checkpointed ev frame is already
    # hash-partitioned on (_key, _bucket) by the w_kb window exchange,
    # and the one-shot operator's windows partition on the same columns
    # — Catalyst reuses that partitioning, so this entire sub-detection
    # runs with ZERO new exchanges (a struct-valued key used to force a
    # full reshuffle of the event frame; measured ~40% of the twin's
    # runtime at sf0.1)
    # _lnp > _fnp prunes single-trigger buckets outright: a local alert
    # needs its own trigger event at a position AFTER the bucket's first
    # trigger, so any bucket whose last trigger IS its first can feed
    # nothing into the sub-detection — at typical trigger densities this
    # empties most of the heavy window/sort chain's input
    local_src = ev.where(
        F.col("_fnp").isNotNull()
        & (F.col("_pos") > F.col("_fnp"))
        & (F.col("_lnp") > F.col("_fnp"))
    ).select("_key", "_bucket", "_ts", "_oid", "_metric", "_size", "_end_s", "_attacker")
    local_alerts = detect_attack_runs(
        local_src,
        key_col=["_key", "_bucket"],
        time_col="_ts",
        order_col="_oid",
        metric_col="_metric",
        low_threshold=low_threshold,
        high_threshold=high_threshold,
        min_run=min_run,
        max_run=max_run,
        window_seconds=window_seconds,
        size_expr=F.col("_size"),
        end_time_col="_end_s",
        attacker_col="_attacker",
    ).select(
        F.col("target_key._key").alias("target_key"),
        "attack_start_time", "attack_end_time", "attacker_id",
        "fragment_count", "avg_packets", "avg_fragment_size",
        "size_reduction_percent",
    )

    # ---- bounded per-(key,bucket) summary, all built-in aggregates.
    # head = anomalous events before the first trigger (whole bucket if
    # none); tail = the fresh run after the last trigger. Ordered detail
    # capped at max_run via sorted collect_list slices; the tail size
    # sum left-folds (F.aggregate) exactly like the scalar reference.
    head_row = F.when(
        F.col("_fnp").isNull() | (F.col("_pos") < F.col("_fnp")),
        F.struct("_ts", "_oid", "_size", "_end_s", "_attacker"),
    )
    tail_row = F.when(
        F.col("_lnp").isNotNull() & (F.col("_pos") > F.col("_lnp")),
        F.struct("_ts", "_oid", "_size", "_end_s", "_attacker"),
    )
    cap = F.lit(max_run)
    per_bucket = ev.groupBy("_key", "_bucket").agg(
        F.count(head_row).cast("long").alias("h_total"),
        F.slice(F.sort_array(F.collect_list(head_row)), 1, max_run).alias("_h"),
        F.count(tail_row).cast("long").alias("t_total"),
        F.slice(F.sort_array(F.collect_list(tail_row)), 1, max_run).alias("_t"),
        F.min(F.when(F.col("_pos") == F.col("_fnp"), F.col("_ts"))).alias("_trig_ts"),
        F.min(F.when(F.col("_pos") == F.col("_fnp"), F.col("_metric"))).alias(
            "trig_metric"
        ),
    )
    fold_sizes = lambda arr, n: F.aggregate(  # noqa: E731 — left fold, scalar-exact
        F.slice(arr, 1, n), F.lit(0.0), lambda a, x: a + x["_size"]
    )
    t_take = F.least(F.col("t_total"), cap).cast("int")
    summaries = per_bucket.select(
        "_key",
        "_bucket",
        "h_total",
        F.coalesce(
            F.try_element_at("_h", F.lit(1))["_ts"].cast("double"), F.lit(0.0)
        ).alias("h_first_ts"),
        F.coalesce(F.try_element_at("_h", F.lit(1))["_attacker"], F.lit("")).alias(
            "h_attacker"
        ),
        F.expr("transform(_h, x -> x._size)").alias("h_sizes"),
        F.expr("transform(_h, x -> x._end_s)").alias("h_ends"),
        F.col("_trig_ts").isNotNull().alias("has_trig"),
        F.coalesce(F.col("_trig_ts").cast("double"), F.lit(0.0)).alias("trig_ts"),
        F.coalesce("trig_metric", F.lit(0.0)).alias("trig_metric"),
        F.col("t_total").alias("t_run"),
        F.least(F.col("t_total"), cap.cast("long")).alias("t_matched"),
        F.coalesce(
            F.try_element_at("_t", F.lit(1))["_ts"].cast("double"), F.lit(0.0)
        ).alias("t_first"),
        F.coalesce(
            F.when(
                t_take > 0, F.try_element_at("_t", F.greatest(t_take, F.lit(1)))
            )["_end_s"],
            F.lit(0.0),
        ).alias("t_end"),
        fold_sizes(F.col("_t"), max_run).alias("t_sum"),
        F.coalesce(F.try_element_at("_t", F.lit(1))["_attacker"], F.lit("")).alias(
            "t_attacker"
        ),
    )

    out_schema = (
        "target_key string, attack_start_time double, attack_end_time double, "
        "attacker_id string, fragment_count long, avg_packets double, "
        "avg_fragment_size double, size_reduction_percent double"
    )

    out_cols = [
        "target_key", "attack_start_time", "attack_end_time",
        "attacker_id", "fragment_count", "avg_packets",
        "avg_fragment_size", "size_reduction_percent",
    ]

    def stitch_one(k: str, recs: list[dict]) -> list[tuple]:
        # recs are (key, bucket)-sorted summary rows for ONE key
        run, matched, first_ts, last_end, ssum, attk = 0, 0, 0.0, 0.0, 0.0, ""
        rows = []
        for r in recs:
            if r["h_total"] > 0:
                if run == 0:
                    first_ts, attk = r["h_first_ts"], r["h_attacker"]
                budget = max_run - matched
                take = min(int(r["h_total"]), max(budget, 0), len(r["h_sizes"]))
                for i in range(take):
                    ssum += r["h_sizes"][i]
                if take > 0:
                    matched += take
                    last_end = r["h_ends"][take - 1]
                run += int(r["h_total"])
            if r["has_trig"]:
                if run >= min_run and r["trig_ts"] - first_ts <= window_seconds:
                    avg_size = ssum / matched
                    ap = float(r["trig_metric"])
                    rows.append(
                        (k, first_ts, last_end, attk, matched, ap, avg_size,
                         (ap - avg_size) / ap * 100.0)
                    )
                run, matched, first_ts, last_end, ssum, attk = (
                    int(r["t_run"]), int(r["t_matched"]), r["t_first"],
                    r["t_end"], r["t_sum"], r["t_attacker"],
                )
        return rows

    def stitch_partition(batches):
        # ONE Arrow exchange per partition instead of one per key:
        # applyInPandas pays ~3-5 ms of Arrow/pandas setup per GROUP,
        # which at |keys| groups dominated the whole operator (measured
        # 7.9 s of a 10 s run at sf0.1 with an empty stitch body). Rows
        # arrive (key, bucket)-sorted within the partition; Arrow batch
        # boundaries may split a key, so the trailing (possibly
        # incomplete) key's rows are carried into the next batch.
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = pdf["_key"].iloc[-1]
            tail_mask = pdf["_key"] == last_key
            pending = pdf[tail_mask]
            body = pdf[~tail_mask]
            if len(body):
                out = _stitch_frame(body)
                if len(out):
                    yield out
        if pending is not None and len(pending):
            out = _stitch_frame(pending)
            if len(out):
                yield out

    def _stitch_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple] = []
        for k, recs in pdf.groupby("_key", sort=False):
            rows.extend(stitch_one(str(k), recs.to_dict("records")))
        return pd.DataFrame(rows, columns=out_cols)

    stitched = (
        summaries.repartition("_key")
        .sortWithinPartitions("_key", "_bucket")
        .mapInPandas(stitch_partition, out_schema)
    )
    key_type = df.schema[key_col].dataType
    fix_key = lambda d: d.withColumn(  # noqa: E731
        "target_key", F.col("target_key").cast(key_type)
    )
    return fix_key(local_alerts).unionByName(fix_key(stitched))
