"""Round-10 surface wave (12 adds, VERDICT r9 #7/#8): a value oracle
for the IPInsights scoring stage (M2 arithmetic hash-checked against a
fixed literal embedding grid), Benford first-digit conformity, robust
trend (Theil-Sen), drawdown/autocorrelation series diagnostics, Chao1
richness, off-hours share, and four supply-chain/pricing reads
(backlog aging, price-ladder gaps, bullwhip variance amplification,
one-way discount ANOVA, monthly fill rate).

Exactness contract (same as round9.py): integer sufficient statistics
(cents / count / epoch-day grids) folded in map-side-combinable hash
aggs; cross-group float partials quantized to a power-of-two grid
BEFORE any order-dependent SUM; float compositions in ONE fixed op
order shared with the DuckDB oracle; sqrt-only transcendentals (IEEE
correctly rounded both engines) except Benford's nine log10 expected
shares, which are PRECOMPUTED PYTHON LITERALS embedded identically in
both plans. Possibly-zero denominators guarded structurally on BOTH
engines (ADVICE r8). The reference's scope ends at fixed-threshold
detection (AD.java:200); this layer is beyond-reference by design
(SURVEY.md §2 extension family).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_Q20 = 1 << 20  # 2^-20 quantization grid for cross-group partials


# ----------------------------------- IPInsights fixed-matrix scoring


_IPF_DIM = 16
_IPF_CAP = 64
_IPF_DEN = 9409.0  # 97^2 — one final division, exact-int numerator


def _ipf_vec_entry(slot: str, d: int, kind: int) -> str:
    """SQL term for the fixed grid matrix: ((slot*31 + d*17 + kind) %
    97) - 48 — small exact integers, identical in Spark/NumPy/DuckDB."""
    return f"((({slot} * 31 + {d * 17 + kind}) % 97) - 48)"


def ml_ipinsights_score_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 scoring arithmetic under a VALUE oracle (VERDICT r9 #7):
    training is legitimately rows-only (iterative SGD), but scoring is
    a deterministic dot product — so score every distinct (user_id,
    event_type) pair against a FIXED integer-grid embedding pair
    (entity matrix E[s][d] = ((s*31+d*17)%97)-48, ip matrix shifted by
    +1) in hash-cap mode (md5-slot % 64, the reference's
    num_entity_vectors semantics — notebook cell 11), through the REAL
    broadcast + vectorized-pandas-UDF scoring path
    (ml/ipinsights.py:410 scorer_udf). anomaly_score = -(E[e]·P[i]) /
    97^2: the dot is a sum of 16 integer products (|v| <= 48, exact in
    float64, order-free), the division is the single rounding step —
    bit-identical to the DuckDB unrolled twin."""
    import numpy as np

    from ..ml.ipinsights import IPInsightsModel

    slots = np.arange(_IPF_CAP).reshape(-1, 1)
    dims = np.arange(_IPF_DIM).reshape(1, -1)
    ev = ((slots * 31 + dims * 17) % 97 - 48).astype(np.float64)
    pv = ((slots * 31 + dims * 17 + 1) % 97 - 48).astype(np.float64)
    model = IPInsightsModel(
        entity_index=None,
        ip_index=None,
        entity_vecs=ev,
        ip_vecs=pv,
        num_entity_vectors=_IPF_CAP,
        num_ip_vectors=_IPF_CAP,
    )
    pairs = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("entity"),
            F.col("event_type").alias("ip"),
        )
        .distinct()
    )
    scored = model.score_dataframe(spark, pairs)
    return (
        scored.select(
            F.col("entity").cast("long").alias("user_id"),
            F.col("ip").alias("event_type"),
            (F.col("anomaly_score") / F.lit(_IPF_DEN)).alias("anomaly_score"),
        )
        .orderBy("user_id", "event_type")
    )


def _ml_ipinsights_score_fixed_sql() -> str:
    es, isl = "eslot", "islot"
    dot = " + ".join(
        f"{_ipf_vec_entry(es, d, 0)} * {_ipf_vec_entry(isl, d, 1)}"
        for d in range(_IPF_DIM)
    )
    return f"""
WITH pairs AS (
  SELECT DISTINCT user_id, event_type FROM events
),
slotted AS (
  SELECT user_id, event_type,
         CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS UBIGINT) % {_IPF_CAP} AS BIGINT) AS eslot,
         CAST(CAST(concat('0x', substr(md5(event_type), 1, 8))
              AS UBIGINT) % {_IPF_CAP} AS BIGINT) AS islot
  FROM pairs
)
SELECT user_id, event_type,
       CAST(-({dot}) AS DOUBLE) / {_IPF_DEN!r} AS anomaly_score
FROM slotted
ORDER BY user_id, event_type
"""


# ------------------------------------------- Benford first-digit MAD

# log10(1 + 1/d) for d = 1..9, as Python double literals shared by both
# engines (no runtime transcendentals).
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def events_benford_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit conformity per event type — the
    classic fabricated-numbers screen (Nigrini's MAD statistic): MAD =
    mean over d=1..9 of |observed digit share - log10(1+1/d)|.

    Exactness: cents = floor(value*100 + 0.5) int64 (> 0 kept); first
    digit via the decimal string head (identical for positive int64 in
    both engines); the (type x 9 digits) grid enumerates MISSING
    digits as real 0-share observations; each |share - expected| term
    is quantized to the 2^-20 grid and int64-summed (order-free), with
    the expected shares embedded as PYTHON DOUBLE LITERALS in both
    plans. Scale: ONE data-sized hash agg to (type, digit); the grid
    is |types| x 9."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    ).where(F.col("c") > 0)
    counts = e.groupBy(
        "event_type",
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("dig"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("dig"))
    types = counts.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(digits))
        .join(counts, ["event_type", "dig"], "left")
        .select(
            "event_type",
            "dig",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        )
    )
    tot = grid.groupBy("event_type").agg(F.sum("n").cast("long").alias("nt"))
    exp_col = F.create_map(
        *[x for d in range(1, 10) for x in (F.lit(d), F.lit(_BENFORD[d]))]
    )
    dev = (
        grid.join(tot, "event_type")
        .select(
            "event_type",
            "nt",
            F.abs(
                F.col("n").cast("double") / F.col("nt").cast("double")
                - exp_col[F.col("dig")]
            ).alias("adev"),
        )
        .select(
            "event_type",
            "nt",
            F.floor(F.col("adev") * _Q20 + F.lit(0.5))
            .cast("long")
            .alias("q"),
            F.col("adev"),
        )
    )
    return (
        dev.groupBy("event_type")
        .agg(
            F.first("nt").alias("n_values"),
            (F.sum("q").cast("double") / F.lit(float(9 * _Q20))).alias("mad"),
            F.max("adev").alias("max_abs_dev"),
        )
        .orderBy("event_type")
    )


def _events_benford_mad_sql() -> str:
    exp_cases = " ".join(
        f"WHEN {d} THEN {_BENFORD[d]!r}" for d in range(1, 10)
    )
    return f"""
WITH vals AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
  WHERE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) > 0
),
counts AS (
  SELECT event_type, CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS dig,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM vals GROUP BY 1, 2
),
grid AS (
  SELECT t.event_type, d.dig, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
  FROM (SELECT DISTINCT event_type FROM counts) t
  CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS dig) d
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.dig = d.dig
),
tot AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS nt FROM grid GROUP BY 1
),
dev AS (
  SELECT g.event_type, t.nt,
         ABS(CAST(g.n AS DOUBLE) / CAST(t.nt AS DOUBLE) -
             CASE g.dig {exp_cases} END) AS adev
  FROM grid g JOIN tot t ON t.event_type = g.event_type
)
SELECT event_type,
       CAST(MIN(nt) AS BIGINT) AS n_values,
       CAST(SUM(CAST(FLOOR(adev * {_Q20} + 0.5) AS BIGINT)) AS DOUBLE)
         / {float(9 * _Q20)!r} AS mad,
       MAX(adev) AS max_abs_dev
FROM dev GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------ backlog aging as-of


def sql_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging as of the corpus' latest order date —
    the receivables-style bucket read (0-30 / 31-90 / 91-365 / 365+
    days): order count, value, and count share per bucket.

    Exactness: ages are epoch-day integer differences against the
    MAX(o_orderdate) scalar; value is cents int64; share is one final
    division. Scale: one data-sized scan + a 4-row agg; the as-of
    scalar broadcasts."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") != F.lit("F")
    )
    asof = o.agg(F.max(F.to_date("o_orderdate")).alias("asof"))
    aged = o.join(F.broadcast(asof)).select(
        F.datediff(F.col("asof"), F.to_date("o_orderdate")).alias("age"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    bucket = (
        F.when(F.col("age") <= 30, F.lit("a_0_30"))
        .when(F.col("age") <= 90, F.lit("b_31_90"))
        .when(F.col("age") <= 365, F.lit("c_91_365"))
        .otherwise(F.lit("d_over_365"))
    )
    agg = aged.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    tot = agg.agg(F.sum("n_orders").cast("long").alias("nt"))
    return (
        agg.join(F.broadcast(tot))
        .select(
            "bucket",
            "n_orders",
            "total_cents",
            (
                F.col("n_orders").cast("double") / F.col("nt").cast("double")
            ).alias("count_share"),
        )
        .orderBy("bucket")
    )


_SQL_BACKLOG_AGING = """
WITH open_orders AS (
  SELECT CAST(o_orderdate AS DATE) AS od,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus <> 'F'
),
as_of AS (SELECT MAX(od) AS d0 FROM open_orders),
aged AS (
  SELECT date_diff('day', od, (SELECT d0 FROM as_of)) AS age, cents
  FROM open_orders
),
bucketed AS (
  SELECT CASE WHEN age <= 30 THEN 'a_0_30'
              WHEN age <= 90 THEN 'b_31_90'
              WHEN age <= 365 THEN 'c_91_365'
              ELSE 'd_over_365' END AS bucket,
         cents
  FROM aged
),
agg AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS total_cents
  FROM bucketed GROUP BY bucket
)
SELECT bucket, n_orders, total_cents,
       CAST(n_orders AS DOUBLE) /
         CAST((SELECT SUM(n_orders) FROM agg) AS DOUBLE) AS count_share
FROM agg
ORDER BY bucket
"""


# --------------------------------------------- price ladder gap scan


def sql_price_ladder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest within-brand price-point gaps — the assortment-hole
    read: sort each brand's DISTINCT retail price points, take the
    LAG step, rank the 20 widest absolute gaps (price tiebreak).

    Exactness: cents int64; rel_gap is one final division (prev > 0
    structurally guaranteed by the > 0 filter). Scale: the window
    partitions by brand over the DISTINCT price frame (catalog-
    bounded, not data-sized)."""
    p = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_brand",
            F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .where(F.col("cents") > 0)
        .distinct()
    )
    w = Window.partitionBy("p_brand").orderBy("cents")
    g = p.select(
        "p_brand",
        F.lag("cents").over(w).alias("prev_cents"),
        F.col("cents").alias("price_cents"),
    ).where(F.col("prev_cents").isNotNull())
    return (
        g.select(
            "p_brand",
            "prev_cents",
            "price_cents",
            (F.col("price_cents") - F.col("prev_cents")).alias("gap_cents"),
            (
                (F.col("price_cents") - F.col("prev_cents")).cast("double")
                / F.col("prev_cents").cast("double")
            ).alias("rel_gap"),
        )
        .orderBy(
            F.col("gap_cents").desc(), "p_brand", "price_cents"
        )
        .limit(20)
    )


_SQL_PRICE_LADDER_GAPS = """
WITH pts AS (
  SELECT DISTINCT p_brand,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part
  WHERE CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) > 0
),
lagged AS (
  SELECT p_brand,
         LAG(cents) OVER (PARTITION BY p_brand ORDER BY cents) AS prev_cents,
         cents AS price_cents
  FROM pts
)
SELECT p_brand, prev_cents, price_cents,
       price_cents - prev_cents AS gap_cents,
       CAST(price_cents - prev_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE)
         AS rel_gap
FROM lagged
WHERE prev_cents IS NOT NULL
ORDER BY gap_cents DESC, p_brand, price_cents
LIMIT 20
"""


# ------------------------------------------------ off-hours activity


def events_odd_hours_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-hours (00:00-05:59) activity share per event type — the
    bot-traffic / abuse screen: counts and value mass in the dead
    hours vs the full day.

    Exactness: integer counts and cents sums; two final divisions
    (count share; value share CASE-guarded for a zero total on BOTH
    engines). Scale: one data-sized hash agg keyed by type."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.hour("ts") <= 5).alias("odd"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("odd"), 1).otherwise(0)).cast("long").alias("n_odd"),
        F.sum("c").cast("long").alias("cents"),
        F.sum(F.when(F.col("odd"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("cents_odd"),
    )
    return agg.select(
        "event_type",
        "n",
        "n_odd",
        (F.col("n_odd").cast("double") / F.col("n").cast("double")).alias(
            "count_share"
        ),
        F.when(
            F.col("cents") != 0,
            F.col("cents_odd").cast("double") / F.col("cents").cast("double"),
        ).alias("value_share"),
    ).orderBy("event_type")


_EVENTS_ODD_HOURS_SQL = """
WITH base AS (
  SELECT event_type,
         (EXTRACT(hour FROM ts) <= 5) AS odd,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN odd THEN 1 ELSE 0 END) AS BIGINT) AS n_odd,
         CAST(SUM(c) AS BIGINT) AS cents,
         CAST(SUM(CASE WHEN odd THEN c ELSE 0 END) AS BIGINT) AS cents_odd
  FROM base GROUP BY event_type
)
SELECT event_type, n, n_odd,
       CAST(n_odd AS DOUBLE) / CAST(n AS DOUBLE) AS count_share,
       CASE WHEN cents <> 0
            THEN CAST(cents_odd AS DOUBLE) / CAST(cents AS DOUBLE)
       END AS value_share
FROM agg
ORDER BY event_type
"""


QUERIES = {
    "ml_ipinsights_score_fixed": ml_ipinsights_score_fixed,
    "events_benford_mad": events_benford_mad,
    "sql_backlog_aging": sql_backlog_aging,
    "sql_price_ladder_gaps": sql_price_ladder_gaps,
    "events_odd_hours_share": events_odd_hours_share,
}

ORACLES = {
    "ml_ipinsights_score_fixed": _ml_ipinsights_score_fixed_sql(),
    "events_benford_mad": _events_benford_mad_sql(),
    "sql_backlog_aging": _SQL_BACKLOG_AGING,
    "sql_price_ladder_gaps": _SQL_PRICE_LADDER_GAPS,
    "events_odd_hours_share": _EVENTS_ODD_HOURS_SQL,
}


# ------------------------------------------ max drawdown of daily P&L


def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily value series per event
    type — the risk lens on activity value: peak-to-trough loss of the
    running cents total, all integer.

    Exactness: daily cents totals are int64; the running sum, running
    peak, drawdown, and max drawdown are int64 window folds — no float
    anywhere. Scale: ONE data-sized hash agg to (type, day); the
    windows run on the calendar-bounded per-type day frame (the
    events_cusum cost argument)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    daily = e.groupBy("event_type", "d").agg(
        F.sum("c").cast("long").alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "event_type",
        "d",
        F.sum("cents").over(w).cast("long").alias("cum"),
    )
    run = cum.select(
        "event_type",
        (F.max("cum").over(w)).cast("long").alias("peak"),
        F.col("cum"),
    )
    return (
        run.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max(F.col("peak") - F.col("cum")).cast("long").alias(
                "max_drawdown_cents"
            ),
            F.max("peak").cast("long").alias("peak_cents"),
        )
        .orderBy("event_type")
    )


_EVENTS_MAX_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, d,
         CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM daily
),
run AS (
  SELECT event_type,
         CAST(MAX(cum) OVER (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS peak,
         cum
  FROM cum
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_cents,
       CAST(MAX(peak) AS BIGINT) AS peak_cents
FROM run GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------- Theil-Sen slope


def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust daily-count trend per event type: the MEDIAN of
    all pairwise slopes (n_j - n_i) / (day_j - day_i) — up to ~29%
    corrupted days cannot move it, unlike the OLS slope
    (events_trend_ols).

    Exactness: days and counts are exact integers; each slope is ONE
    double division (identical both engines); the median is a
    POSITIONAL PICK (row_number = (m+1) div 2 over slope-ordered
    pairs) — no interpolation, so ties and float order cannot drift.
    Scale: the pair frame is CALENDAR-bounded per type (~C(31,2) rows
    — the events_kendall_tau argument); the only data-sized stage is
    the daily agg."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
    )
    daily = e.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = daily.select(
        F.col("event_type").alias("t"),
        F.col("d").alias("d1"),
        F.col("n").alias("n1"),
    )
    b = daily.select(
        F.col("event_type").alias("t"),
        F.col("d").alias("d2"),
        F.col("n").alias("n2"),
    )
    pairs = a.join(b, "t").where(F.col("d1") < F.col("d2"))
    slopes = pairs.select(
        "t",
        (
            (F.col("n2") - F.col("n1")).cast("double")
            / F.datediff("d2", "d1").cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("t").orderBy("slope")
    cnt = Window.partitionBy("t")
    ranked = slopes.select(
        "t",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("m"),
    )
    return (
        ranked.where(F.col("rn") == F.expr("(m + 1) div 2"))
        .select(
            F.col("t").alias("event_type"),
            F.col("m").cast("long").alias("n_pairs"),
            F.col("slope").alias("ts_slope"),
        )
        .orderBy("event_type")
    )


_EVENTS_THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type AS t, CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.t,
         CAST(b.n - a.n AS DOUBLE) / CAST(date_diff('day', a.d, b.d) AS DOUBLE)
           AS slope
  FROM daily a JOIN daily b ON b.t = a.t AND a.d < b.d
),
ranked AS (
  SELECT t, slope,
         ROW_NUMBER() OVER (PARTITION BY t ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY t) AS m
  FROM pairs
)
SELECT t AS event_type,
       CAST(m AS BIGINT) AS n_pairs,
       slope AS ts_slope
FROM ranked
WHERE rn = (m + 1) // 2
ORDER BY event_type
"""


# -------------------------------------------- lag-7 autocorrelation


def events_weekly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-7 Pearson autocorrelation of the daily count series per
    event type, zeros enumerated — the weekly-seasonality strength
    read next to sql_seasonal_index.

    Exactness: the Pearson recipe — integer sufficient statistics
    over (x_t, x_{t+7}) pairs from the ZERO-FILLED day grid
    (round7._daily_grid twin), r composed as (n*Sxy - Sx*Sy) /
    (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)) with sqrt(a)*sqrt(b)
    (the overflow-guard op order) — sqrt is IEEE correctly rounded
    both engines. Degenerate series (either side constant) are
    structurally NULL on both. Scale: grid and pair frames are
    calendar x |types| bounded."""
    from .round7 import _daily_grid

    g = _daily_grid(spark, sf_dir)
    pairs = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.t") == F.col("b.t"))
            & (F.datediff(F.col("b.d"), F.col("a.d")) == F.lit(7)),
        )
        .select(
            F.col("a.t").alias("t"),
            F.col("a.n").alias("x"),
            F.col("b.n").alias("y"),
        )
    )
    s = pairs.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    r = F.when(
        (vx > 0) & (vy > 0),
        num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
    )
    return (
        s.select(
            F.col("t").alias("event_type"),
            F.col("n").alias("n_pairs"),
            r.alias("acf7"),
        )
        .orderBy("event_type")
    )


def _events_weekly_autocorr_sql() -> str:
    from .round7 import _DAILY_GRID_SQL

    return f"""
WITH {_DAILY_GRID_SQL.lstrip()},
pairs AS (
  SELECT a.t, a.n AS x, b.n AS y
  FROM grid a JOIN grid b
    ON b.t = a.t AND date_diff('day', a.d, b.d) = 7
),
s AS (
  SELECT t,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY t
)
SELECT t AS event_type,
       n AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE) /
         (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) *
          SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS acf7
FROM s
ORDER BY event_type
"""


# ---------------------------------------------- Chao1 richness


def events_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 unseen-species estimate of the user population per event
    type — "how many users WOULD we see with infinite sampling":
    S_chao1 = S_obs + f1*(f1-1) / (2*(f2+1)) (the bias-corrected
    form, defined even when no user was seen exactly twice).

    Exactness: f1/f2/S_obs are exact integer abundance counts; the
    estimator is integer arithmetic plus ONE final division. Scale:
    two hash aggs — data-sized (type, user) then |users|-sized
    abundance histogram."""
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    s = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("k") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    chao = (
        F.col("s_obs").cast("double")
        + (F.col("f1") * (F.col("f1") - 1)).cast("double")
        / (2 * (F.col("f2") + 1)).cast("double")
    )
    return s.select(
        "event_type", "s_obs", "f1", "f2", chao.alias("chao1")
    ).orderBy("event_type")


_EVENTS_CHAO1_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS s_obs,
         CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM per_user GROUP BY event_type
)
SELECT event_type, s_obs, f1, f2,
       CAST(s_obs AS DOUBLE) +
         CAST(f1 * (f1 - 1) AS DOUBLE) / CAST(2 * (f2 + 1) AS DOUBLE)
         AS chao1
FROM s
ORDER BY event_type
"""


QUERIES.update(
    {
        "events_max_drawdown": events_max_drawdown,
        "events_theil_sen": events_theil_sen,
        "events_weekly_autocorr": events_weekly_autocorr,
        "events_chao1_richness": events_chao1_richness,
    }
)

ORACLES.update(
    {
        "events_max_drawdown": _EVENTS_MAX_DRAWDOWN_SQL,
        "events_theil_sen": _EVENTS_THEIL_SEN_SQL,
        "events_weekly_autocorr": _events_weekly_autocorr_sql(),
        "events_chao1_richness": _EVENTS_CHAO1_SQL,
    }
)


# --------------------------------------------- bullwhip amplification


def sql_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip effect proxy: variance amplification of ORDERED
    monthly quantity relative to SHIPPED monthly quantity — >1 means
    order placement is noisier than physical fulfilment, the classic
    supply-chain instability read.

    Exactness: l_quantity values are integral doubles -> exact int64;
    monthly totals fold on the UNION month grid (a month missing on
    one side is a real 0); variances use the integer recipe n*Sxx -
    Sx^2; the ratio is ONE final division of exact int64 composites
    (guarded > 0 structurally both engines). Overflow bound: monthly
    totals ~2e5 at sf0.1 -> n*Sxx ~ 3e12; safe to ~sf100, documented.
    Scale: two data-sized hash aggs to month grain; the grid is
    calendar-bounded."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("m"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("q"),
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ship_m"),
    )
    ordered = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("m")
        .agg(F.sum("q").cast("long").alias("qo"))
    )
    shipped = li.groupBy(F.col("ship_m").alias("m")).agg(
        F.sum("q").cast("long").alias("qs")
    )
    grid = (
        ordered.join(shipped, "m", "full")
        .select(
            "m",
            F.coalesce("qo", F.lit(0).cast("long")).alias("qo"),
            F.coalesce("qs", F.lit(0).cast("long")).alias("qs"),
        )
    )
    s = grid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qo").cast("long").alias("so"),
        F.sum(F.col("qo") * F.col("qo")).cast("long").alias("soo"),
        F.sum("qs").cast("long").alias("ss"),
        F.sum(F.col("qs") * F.col("qs")).cast("long").alias("sss"),
    )
    vo = F.col("n") * F.col("soo") - F.col("so") * F.col("so")
    vs = F.col("n") * F.col("sss") - F.col("ss") * F.col("ss")
    return s.select(
        F.col("n").alias("n_months"),
        vo.cast("long").alias("var_num_ordered"),
        vs.cast("long").alias("var_num_shipped"),
        F.when(vs > 0, vo.cast("double") / vs.cast("double")).alias(
            "bullwhip"
        ),
    )


_SQL_BULLWHIP_SQL = """
WITH li AS (
  SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS q,
         EXTRACT(year FROM l_shipdate) * 100 +
           EXTRACT(month FROM l_shipdate) AS ship_m
  FROM lineitem
),
ordered AS (
  SELECT EXTRACT(year FROM o.o_orderdate) * 100 +
           EXTRACT(month FROM o.o_orderdate) AS m,
         CAST(SUM(li.q) AS BIGINT) AS qo
  FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
  GROUP BY 1
),
shipped AS (
  SELECT ship_m AS m, CAST(SUM(q) AS BIGINT) AS qs FROM li GROUP BY 1
),
grid AS (
  SELECT COALESCE(o.m, s.m) AS m,
         CAST(COALESCE(o.qo, 0) AS BIGINT) AS qo,
         CAST(COALESCE(s.qs, 0) AS BIGINT) AS qs
  FROM ordered o FULL JOIN shipped s ON s.m = o.m
),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qo) AS BIGINT) AS so,
         CAST(SUM(qo * qo) AS BIGINT) AS soo,
         CAST(SUM(qs) AS BIGINT) AS ss,
         CAST(SUM(qs * qs) AS BIGINT) AS sss
  FROM grid
)
SELECT n AS n_months,
       CAST(n * soo - so * so AS BIGINT) AS var_num_ordered,
       CAST(n * sss - ss * ss AS BIGINT) AS var_num_shipped,
       CASE WHEN n * sss - ss * ss > 0 THEN
         CAST(n * soo - so * so AS DOUBLE) /
         CAST(n * sss - ss * ss AS DOUBLE)
       END AS bullwhip
FROM st
"""


# --------------------------------------------- one-way discount ANOVA


def sql_discount_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for discount level across brands —
    "does any brand get systematically different discounts": F =
    (SSB/(k-1)) / (SSW/(N-k)) over the d100 = round(discount*100)
    integer grid, joined lineitem -> part for the brand factor.

    Exactness: per-brand n/S/Q are exact int64; each brand's S^2/n
    term (the one intrinsically rational quantity) is quantized to the
    2^-20 grid BEFORE the cross-brand sum (order-free int64 fold, the
    round-9b recipe); SSB/SSW/F compose in ONE float expression shared
    with the oracle; k > 1, N > k, SSW > 0 guarded structurally.
    Scale: one data-sized join+agg to the |brands|-bounded frame
    (25 brands); everything after is constant-size."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("d"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum("d").cast("long").alias("sg"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("qg"),
        )
    )
    terms = g.select(
        "ng",
        "sg",
        "qg",
        F.floor(
            (F.col("sg") * F.col("sg")).cast("double")
            / F.col("ng").cast("double")
            * _Q20
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tq"),
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("qg").cast("long").alias("q"),
        F.sum("tq").cast("long").alias("a_q"),
    )
    a = F.col("a_q").cast("double") / F.lit(float(_Q20))
    ssb = a - (F.col("s") * F.col("s")).cast("double") / F.col("n").cast(
        "double"
    )
    ssw = F.col("q").cast("double") - a
    f_stat = F.when(
        (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0),
        (ssb / (F.col("k") - 1).cast("double"))
        / (ssw / (F.col("n") - F.col("k")).cast("double")),
    )
    return s.select(
        F.col("k").alias("n_brands"),
        F.col("n").alias("n_items"),
        f_stat.alias("f_stat"),
    )


_SQL_DISCOUNT_ANOVA = f"""
WITH d AS (
  SELECT p.p_brand, CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT) AS d
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
g AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(d) AS BIGINT) AS sg,
         CAST(SUM(d * d) AS BIGINT) AS qg
  FROM d GROUP BY p_brand
),
terms AS (
  SELECT ng, sg, qg,
         CAST(FLOOR(CAST(sg * sg AS DOUBLE) / CAST(ng AS DOUBLE)
              * {1 << 20} + 0.5) AS BIGINT) AS tq
  FROM g
),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(sg) AS BIGINT) AS s,
         CAST(SUM(qg) AS BIGINT) AS q,
         CAST(SUM(tq) AS BIGINT) AS a_q
  FROM terms
)
SELECT k AS n_brands,
       n AS n_items,
       CASE WHEN k > 1 AND n > k AND
                 CAST(q AS DOUBLE) - CAST(a_q AS DOUBLE) / {float(1 << 20)!r}
                   > 0
            THEN
         ((CAST(a_q AS DOUBLE) / {float(1 << 20)!r}
           - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE))
          / CAST(k - 1 AS DOUBLE))
         / ((CAST(q AS DOUBLE) - CAST(a_q AS DOUBLE) / {float(1 << 20)!r})
            / CAST(n - k AS DOUBLE))
       END AS f_stat
FROM st
"""


# ---------------------------------------------- monthly fill rate


def sql_fill_rate_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day fulfilment share per order month: fraction of lineitems
    shipped within 30 days of order placement — the service-level
    trend operations watches.

    Exactness: ages are epoch-day integer differences; counts int64;
    one final division per month. Scale: one join + one hash agg to
    the calendar-bounded month grain."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.to_date("l_shipdate").alias("sd"),
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        (F.year("od") * 100 + F.month("od")).alias("m"),
        (F.datediff("sd", "od") <= 30).alias("fast"),
    )
    agg = j.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.when(F.col("fast"), 1).otherwise(0))
        .cast("long")
        .alias("n_fast"),
    )
    return agg.select(
        "m",
        "n_items",
        "n_fast",
        (
            F.col("n_fast").cast("double") / F.col("n_items").cast("double")
        ).alias("fill_rate"),
    ).orderBy("m")


_SQL_FILL_RATE_SQL = """
WITH j AS (
  SELECT EXTRACT(year FROM o.o_orderdate) * 100 +
           EXTRACT(month FROM o.o_orderdate) AS m,
         (date_diff('day', CAST(o.o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) <= 30) AS fast
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT m,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN fast THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
       CAST(SUM(CASE WHEN fast THEN 1 ELSE 0 END) AS DOUBLE) /
         CAST(COUNT(*) AS DOUBLE) AS fill_rate
FROM j GROUP BY m
ORDER BY m
"""


QUERIES.update(
    {
        "sql_bullwhip_ratio": sql_bullwhip_ratio,
        "sql_discount_anova": sql_discount_anova,
        "sql_fill_rate_monthly": sql_fill_rate_monthly,
    }
)

ORACLES.update(
    {
        "sql_bullwhip_ratio": _SQL_BULLWHIP_SQL,
        "sql_discount_anova": _SQL_DISCOUNT_ANOVA,
        "sql_fill_rate_monthly": _SQL_FILL_RATE_SQL,
    }
)
