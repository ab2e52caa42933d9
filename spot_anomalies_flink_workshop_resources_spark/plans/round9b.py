"""Round-9 wave 3 (adds 11-15 of the 15-query round cap, VERDICT r8
#1): modern dependence measures, stratified epidemiology-style
association, finance-grade revenue decomposition, causal uplift, and
gaps-and-islands streak analytics.

Exactness contract (same as round9.py): integer sufficient statistics
(cents / dollar / count grids) folded in map-side-combinable hash
aggs; cross-stratum float partials quantized to a power-of-two grid
BEFORE any order-dependent SUM (double addition is non-associative —
int64 grid sums are partitioning-independent); float compositions in
ONE fixed op order shared with the DuckDB oracle; possibly-zero
denominators and negative radicands guarded structurally on BOTH
engines (ADVICE r8). The reference's scope ends at fixed-threshold
detection (AD.java:200); this layer is beyond-reference by design
(SURVEY.md §2 extension family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

_Q20 = 1 << 20  # 2^-20 quantization grid for cross-stratum partials
_Q10 = 1 << 10  # coarser grid for cents-scaled effect partials


# ---------------------------------------- Chatterjee xi correlation


def events_xi_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's xi (2020) — a rank-based dependence coefficient
    that, unlike Pearson/Spearman (events_spearman), detects NON-
    monotone functional dependence and converges to 0 iff
    independence. Measured per event type between daily event count x
    and daily total value y: xi_n = 1 - 3 * sum|r_{i+1} - r_i| /
    (n^2 - 1), where days are ordered by (x, day) — the deterministic
    tie-break BOTH engines share — and r_i = #{j : y_j <= y_i}.

    Exactness: x, y are exact int64 (count, cents sum); ranks are the
    tie-inclusive RANGE-frame COUNT(*), integer; the |rank-step| sum
    is an int64 fold; xi composes in one float expression. Guard:
    n_days > 1 (the n^2 - 1 denominator) filtered structurally on both
    engines. Scale: ONE data-sized hash agg to (type, day); every
    window runs on the calendar-bounded per-type day frame (the
    events_acf contract)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    daily = e.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum("c").cast("long").alias("y"),
    )
    w_rank = (
        Window.partitionBy("event_type")
        .orderBy("y")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = daily.withColumn("r", F.count(F.lit(1)).over(w_rank))
    w_seq = Window.partitionBy("event_type").orderBy("x", "d")
    stepped = ranked.withColumn(
        "step", F.abs(F.col("r") - F.lag("r").over(w_seq))
    )
    agg = stepped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("step").cast("long").alias("sum_step"),
    )
    return (
        agg.where(F.col("n_days") > 1)
        .select(
            "event_type",
            "n_days",
            (
                F.lit(1.0)
                - F.lit(3.0)
                * F.col("sum_step").cast("double")
                / (
                    F.col("n_days").cast("double") * F.col("n_days")
                    - F.lit(1.0)
                )
            ).alias("xi"),
        )
        .orderBy("event_type")
    )


EVENTS_XI_CORRELATION_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
ranked AS (
  SELECT *, COUNT(*) OVER (
           PARTITION BY event_type ORDER BY y
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
  FROM daily
),
stepped AS (
  SELECT event_type,
         ABS(r - LAG(r) OVER (PARTITION BY event_type ORDER BY x, d))
           AS step
  FROM ranked
),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(step) AS BIGINT) AS sum_step
  FROM stepped GROUP BY event_type
)
SELECT event_type, n_days,
       1.0 - 3.0 * CAST(sum_step AS DOUBLE)
             / (CAST(n_days AS DOUBLE) * n_days - 1.0) AS xi
FROM agg WHERE n_days > 1
ORDER BY event_type
"""


# ------------------------------- Cochran-Mantel-Haenszel association


def events_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel chi-square: is afternoon activity
    (hour >= 12) associated with high-value events (value >= 250),
    CONTROLLING for day-of-week? The stratified complement to
    events_chi2_independence — a marginal 2x2 can show association
    that is pure Simpson's-paradox confounding by weekday; CMH pools
    the per-stratum evidence instead. Statistic (no continuity
    correction, documented): (sum a_k - sum E[a_k])^2 / sum V_k with
    E[a_k] = n1*m1/N and V_k = n1*n0*m1*m0 / (N^2 (N-1)).

    Exactness: the 7x2x2 table comes from ONE integer hash agg;
    per-stratum E and V are double expressions in one fixed op order
    (pure-double products — the int64 n1*m1 cross-product would
    overflow past ~3e9 events/stratum, the dq_segment_balance bound),
    then quantized to the 2^-20 grid so the cross-stratum SUM is an
    order-independent int64 fold. Strata with an empty margin (V = 0)
    are filtered structurally on both engines. Scale: one data-sized
    agg to 28 cells; everything after is a 7-row frame."""
    e = load_table(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),  # Sun=0..Sat=6
        (F.hour("ts") >= 12).cast("int").alias("pm"),
        (F.col("value") >= 250).cast("int").alias("hi"),
    )
    cells = e.groupBy("dow", "pm", "hi").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    strata = cells.groupBy("dow").agg(
        F.sum(F.when((F.col("pm") == 1) & (F.col("hi") == 1), F.col("cnt"))
              .otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("pm") == 1, F.col("cnt")).otherwise(0))
        .cast("long").alias("n1"),
        F.sum(F.when(F.col("pm") == 0, F.col("cnt")).otherwise(0))
        .cast("long").alias("n0"),
        F.sum(F.when(F.col("hi") == 1, F.col("cnt")).otherwise(0))
        .cast("long").alias("m1"),
        F.sum(F.when(F.col("hi") == 0, F.col("cnt")).otherwise(0))
        .cast("long").alias("m0"),
        F.sum("cnt").cast("long").alias("nt"),
    )
    ok = strata.where(
        (F.col("n1") > 0) & (F.col("n0") > 0) & (F.col("m1") > 0)
        & (F.col("m0") > 0) & (F.col("nt") > 1)
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ev = ok.select(
        "a",
        F.floor(
            d("n1") * d("m1") / d("nt") * F.lit(float(_Q20)) + F.lit(0.5)
        ).cast("long").alias("e_q"),
        F.floor(
            d("n1") * d("n0") * d("m1") * d("m0")
            / (d("nt") * d("nt") * (d("nt") - F.lit(1.0)))
            * F.lit(float(_Q20))
            + F.lit(0.5)
        ).cast("long").alias("v_q"),
    )
    tot = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum("e_q").cast("long").alias("sum_eq"),
        F.sum("v_q").cast("long").alias("sum_vq"),
    )
    return tot.where(F.col("sum_vq") > 0).select(
        "n_strata",
        "sum_a",
        (F.col("sum_eq").cast("double") / F.lit(float(_Q20))).alias("sum_e"),
        (
            (
                F.col("sum_a").cast("double")
                - F.col("sum_eq").cast("double") / F.lit(float(_Q20))
            )
            * (
                F.col("sum_a").cast("double")
                - F.col("sum_eq").cast("double") / F.lit(float(_Q20))
            )
            / (F.col("sum_vq").cast("double") / F.lit(float(_Q20)))
        ).alias("cmh_stat"),
    )


EVENTS_CMH_TEST_SQL = f"""
WITH cells AS (
  SELECT dayofweek(ts) AS dow,
         CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END AS pm,
         CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hi,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2, 3
),
strata AS (
  SELECT dow,
         CAST(SUM(CASE WHEN pm = 1 AND hi = 1 THEN cnt ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN pm = 1 THEN cnt ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN pm = 0 THEN cnt ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN hi = 1 THEN cnt ELSE 0 END) AS BIGINT) AS m1,
         CAST(SUM(CASE WHEN hi = 0 THEN cnt ELSE 0 END) AS BIGINT) AS m0,
         CAST(SUM(cnt) AS BIGINT) AS nt
  FROM cells GROUP BY dow
),
ev AS (
  SELECT a,
         CAST(FLOOR(CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE)
                    / CAST(nt AS DOUBLE) * {float(_Q20)} + 0.5)
              AS BIGINT) AS e_q,
         CAST(FLOOR(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                    * CAST(m1 AS DOUBLE) * CAST(m0 AS DOUBLE)
                    / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                       * (CAST(nt AS DOUBLE) - 1.0))
                    * {float(_Q20)} + 0.5) AS BIGINT) AS v_q
  FROM strata
  WHERE n1 > 0 AND n0 > 0 AND m1 > 0 AND m0 > 0 AND nt > 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(a) AS BIGINT) AS sum_a,
         CAST(SUM(e_q) AS BIGINT) AS sum_eq,
         CAST(SUM(v_q) AS BIGINT) AS sum_vq
  FROM ev
)
SELECT n_strata, sum_a,
       CAST(sum_eq AS DOUBLE) / {float(_Q20)} AS sum_e,
       (CAST(sum_a AS DOUBLE) - CAST(sum_eq AS DOUBLE) / {float(_Q20)})
       * (CAST(sum_a AS DOUBLE) - CAST(sum_eq AS DOUBLE) / {float(_Q20)})
       / (CAST(sum_vq AS DOUBLE) / {float(_Q20)}) AS cmh_stat
FROM tot WHERE sum_vq > 0
"""


# ------------------------------------- YoY price/volume/mix bridge


def sql_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue BRIDGE: decompose each ship-year's
    revenue delta into PRICE effect ((p1-p0)*q0), VOLUME effect
    (p0*(q1-q0)) and MIX/cross effect ((p1-p0)*(q1-q0)), summed over
    brands — the CFO's waterfall ("did we sell more, or sell dearer?").
    Complements sql_new_vs_returning (WHO drives growth) with WHAT
    drives it; sql_price_index_fisher prices a fixed basket, this
    attributes the actual delta.

    Exactness: the (brand, year) frame carries exact int64 qty and
    cents; per-brand unit price and effects are double expressions in
    one fixed op order; per-brand effects are quantized to the 2^-10
    grid so per-year sums are order-independent int64 folds (raw
    double SUM over brands would be partitioning-dependent);
    total_delta is an EXACT int64 cents difference. Brands with a
    missing or zero-qty prior year are excluded from the effect sums
    structurally (LAG year continuity + qty > 0 on both engines).
    Int64 bound: effect*2^10 stays under 2^63 while per-(brand, year)
    revenue is below ~9e15 cents (~90 T$ — re-base to 2^0 past that).
    Scale: ONE data-sized hash agg; everything after runs on the
    |brands| x |years| frame (the sql_rank_momentum contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    by = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand"), F.year("l_shipdate").cast("int").alias("yr")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"),
            F.sum(cents).cast("long").alias("c"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy("yr")
    lagged = by.select(
        "p_brand", "yr", "q", "c",
        F.lag("yr").over(w).alias("yr0"),
        F.lag("q").over(w).alias("q0"),
        F.lag("c").over(w).alias("c0"),
    ).where(
        (F.col("yr0") == F.col("yr") - 1)
        & (F.col("q0") > 0)
        & (F.col("q") > 0)
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p1 = d("c") / d("q")
    p0 = d("c0") / d("q0")
    eff = lagged.select(
        "yr", "c", "c0",
        F.floor((p1 - p0) * d("q0") * F.lit(float(_Q10)) + F.lit(0.5))
        .cast("long").alias("price_q"),
        F.floor(p0 * (d("q") - d("q0")) * F.lit(float(_Q10)) + F.lit(0.5))
        .cast("long").alias("vol_q"),
        F.floor(
            (p1 - p0) * (d("q") - d("q0")) * F.lit(float(_Q10)) + F.lit(0.5)
        ).cast("long").alias("mix_q"),
    )
    out = eff.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.sum("price_q").cast("long").alias("pq"),
        F.sum("vol_q").cast("long").alias("vq"),
        F.sum("mix_q").cast("long").alias("mq"),
        F.sum(F.col("c") - F.col("c0")).cast("long").alias("dc"),
    )
    qd = lambda c: F.col(c).cast("double") / F.lit(float(_Q10)) / F.lit(  # noqa: E731
        100.0
    )
    return out.select(
        "yr", "n_brands",
        qd("pq").alias("price_effect"),
        qd("vq").alias("volume_effect"),
        qd("mq").alias("mix_effect"),
        (F.col("dc").cast("double") / F.lit(100.0)).alias("total_delta"),
    ).orderBy("yr")


SQL_REVENUE_BRIDGE_SQL = f"""
WITH by_brand AS (
  SELECT p.p_brand, CAST(year(l_shipdate) AS INT) AS yr,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
  GROUP BY p.p_brand, CAST(year(l_shipdate) AS INT)
),
lagged AS (
  SELECT p_brand, yr, q, c,
         LAG(yr) OVER (PARTITION BY p_brand ORDER BY yr) AS yr0,
         LAG(q) OVER (PARTITION BY p_brand ORDER BY yr) AS q0,
         LAG(c) OVER (PARTITION BY p_brand ORDER BY yr) AS c0
  FROM by_brand
),
eff AS (
  SELECT yr, c, c0,
         CAST(FLOOR((CAST(c AS DOUBLE) / CAST(q AS DOUBLE)
                     - CAST(c0 AS DOUBLE) / CAST(q0 AS DOUBLE))
                    * CAST(q0 AS DOUBLE) * {float(_Q10)} + 0.5)
              AS BIGINT) AS price_q,
         CAST(FLOOR(CAST(c0 AS DOUBLE) / CAST(q0 AS DOUBLE)
                    * (CAST(q AS DOUBLE) - CAST(q0 AS DOUBLE))
                    * {float(_Q10)} + 0.5) AS BIGINT) AS vol_q,
         CAST(FLOOR((CAST(c AS DOUBLE) / CAST(q AS DOUBLE)
                     - CAST(c0 AS DOUBLE) / CAST(q0 AS DOUBLE))
                    * (CAST(q AS DOUBLE) - CAST(q0 AS DOUBLE))
                    * {float(_Q10)} + 0.5) AS BIGINT) AS mix_q
  FROM lagged
  WHERE yr0 = yr - 1 AND q0 > 0 AND q > 0
)
SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_brands,
       CAST(SUM(price_q) AS DOUBLE) / {float(_Q10)} / 100.0
         AS price_effect,
       CAST(SUM(vol_q) AS DOUBLE) / {float(_Q10)} / 100.0
         AS volume_effect,
       CAST(SUM(mix_q) AS DOUBLE) / {float(_Q10)} / 100.0 AS mix_effect,
       CAST(SUM(c - c0) AS DOUBLE) / 100.0 AS total_delta
FROM eff GROUP BY yr ORDER BY yr
"""


# ------------------------------------ promo difference-in-differences


def sql_promo_uplift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences uplift: did PROMO-type parts' mean
    per-lineitem revenue move differently from other parts across the
    1999-01-01 boundary? DiD = (promo_after - promo_before) -
    (other_after - other_before), with a Welch-style SE from the four
    cells' variances — the causal-inference step beyond q14's plain
    promo share (SURVEY §2 q14; the treatment/control x before/after
    design is the standard observational-uplift screen).

    Exactness: per-lineitem revenue on the integer DOLLAR grid
    (FLOOR(x + 0.5)) — the cents grid's sum of squares would overflow
    int64 at ~3e5 rows/cell; dollars hold to ~8e8 rows/cell
    (documented, the corpus_length_lognormal pattern); the four
    (n, s, q) triples come from ONE hash agg, pivoted via MAX(CASE)
    so no cross-group float sums exist; means/variances/z compose in
    one fixed op order with the GREATEST(0.0, ...) radicand clamp
    (ADVICE r8 events_cohens_d lesson) and n > 1 + positive-SE
    structural guards on both engines. Scale: one data-sized agg to 4
    cells; the tail is a 1-row frame."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("is_promo")
    )
    dollars = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        + F.lit(0.5)
    ).cast("long")
    cells = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.col("is_promo").cast("int").alias("pr"),
            (F.col("l_shipdate") >= F.lit("1999-01-01")).cast("int")
            .alias("af"),
            dollars.alias("v"),
        )
        .groupBy("pr", "af")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("q"),
        )
    )
    g = lambda pr, af, c: F.max(  # noqa: E731
        F.when((F.col("pr") == pr) & (F.col("af") == af), F.col(c))
    )
    flat = cells.agg(
        g(1, 0, "n").alias("n_pb"), g(1, 0, "s").alias("s_pb"),
        g(1, 0, "q").alias("q_pb"),
        g(1, 1, "n").alias("n_pa"), g(1, 1, "s").alias("s_pa"),
        g(1, 1, "q").alias("q_pa"),
        g(0, 0, "n").alias("n_ob"), g(0, 0, "s").alias("s_ob"),
        g(0, 0, "q").alias("q_ob"),
        g(0, 1, "n").alias("n_oa"), g(0, 1, "s").alias("s_oa"),
        g(0, 1, "q").alias("q_oa"),
    ).where(
        (F.col("n_pb") > 1) & (F.col("n_pa") > 1)
        & (F.col("n_ob") > 1) & (F.col("n_oa") > 1)
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = lambda t: d(f"s_{t}") / d(f"n_{t}")  # noqa: E731
    # variance-over-n in one fixed op order, radicand clamped >= 0
    von = lambda t: F.greatest(  # noqa: E731
        F.lit(0.0), d(f"q_{t}") - d(f"s_{t}") * (d(f"s_{t}") / d(f"n_{t}"))
    ) / (d(f"n_{t}") - F.lit(1.0)) / d(f"n_{t}")
    did = (mean("pa") - mean("pb")) - (mean("oa") - mean("ob"))
    se = F.sqrt(von("pa") + von("pb") + von("oa") + von("ob"))
    out = flat.select(
        "n_pb", "n_pa", "n_ob", "n_oa",
        did.alias("did"),
        se.alias("se"),
        (did / se).alias("z_stat"),
    )
    return out.where(F.col("se") > 0)


SQL_PROMO_UPLIFT_DID_SQL = """
WITH cells AS (
  SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS pr,
         CASE WHEN l_shipdate >= DATE '1999-01-01' THEN 1 ELSE 0 END
           AS af,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) + 0.5)
                       AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) + 0.5)
                       AS BIGINT)
                  * CAST(FLOOR(l_extendedprice * (1.0 - l_discount) + 0.5)
                         AS BIGINT)) AS BIGINT) AS q
  FROM lineitem li JOIN part p ON p.p_partkey = li.l_partkey
  GROUP BY 1, 2
),
flat AS (
  SELECT
    MAX(CASE WHEN pr = 1 AND af = 0 THEN n END) AS n_pb,
    MAX(CASE WHEN pr = 1 AND af = 0 THEN s END) AS s_pb,
    MAX(CASE WHEN pr = 1 AND af = 0 THEN q END) AS q_pb,
    MAX(CASE WHEN pr = 1 AND af = 1 THEN n END) AS n_pa,
    MAX(CASE WHEN pr = 1 AND af = 1 THEN s END) AS s_pa,
    MAX(CASE WHEN pr = 1 AND af = 1 THEN q END) AS q_pa,
    MAX(CASE WHEN pr = 0 AND af = 0 THEN n END) AS n_ob,
    MAX(CASE WHEN pr = 0 AND af = 0 THEN s END) AS s_ob,
    MAX(CASE WHEN pr = 0 AND af = 0 THEN q END) AS q_ob,
    MAX(CASE WHEN pr = 0 AND af = 1 THEN n END) AS n_oa,
    MAX(CASE WHEN pr = 0 AND af = 1 THEN s END) AS s_oa,
    MAX(CASE WHEN pr = 0 AND af = 1 THEN q END) AS q_oa
  FROM cells
),
stats AS (
  SELECT n_pb, n_pa, n_ob, n_oa,
         (CAST(s_pa AS DOUBLE) / CAST(n_pa AS DOUBLE)
          - CAST(s_pb AS DOUBLE) / CAST(n_pb AS DOUBLE))
         - (CAST(s_oa AS DOUBLE) / CAST(n_oa AS DOUBLE)
            - CAST(s_ob AS DOUBLE) / CAST(n_ob AS DOUBLE)) AS did,
         SQRT(
           GREATEST(0.0, CAST(q_pa AS DOUBLE)
             - CAST(s_pa AS DOUBLE) * (CAST(s_pa AS DOUBLE)
                                       / CAST(n_pa AS DOUBLE)))
             / (CAST(n_pa AS DOUBLE) - 1.0) / CAST(n_pa AS DOUBLE)
           + GREATEST(0.0, CAST(q_pb AS DOUBLE)
             - CAST(s_pb AS DOUBLE) * (CAST(s_pb AS DOUBLE)
                                       / CAST(n_pb AS DOUBLE)))
             / (CAST(n_pb AS DOUBLE) - 1.0) / CAST(n_pb AS DOUBLE)
           + GREATEST(0.0, CAST(q_oa AS DOUBLE)
             - CAST(s_oa AS DOUBLE) * (CAST(s_oa AS DOUBLE)
                                       / CAST(n_oa AS DOUBLE)))
             / (CAST(n_oa AS DOUBLE) - 1.0) / CAST(n_oa AS DOUBLE)
           + GREATEST(0.0, CAST(q_ob AS DOUBLE)
             - CAST(s_ob AS DOUBLE) * (CAST(s_ob AS DOUBLE)
                                       / CAST(n_ob AS DOUBLE)))
             / (CAST(n_ob AS DOUBLE) - 1.0) / CAST(n_ob AS DOUBLE)
         ) AS se
  FROM flat
  WHERE n_pb > 1 AND n_pa > 1 AND n_ob > 1 AND n_oa > 1
)
SELECT n_pb, n_pa, n_ob, n_oa, did, se, did / se AS z_stat
FROM stats WHERE se > 0
"""


# ---------------------------------------- MoM growth streak islands


def sql_growth_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest month-over-month revenue GROWTH STREAK per nation —
    the gaps-and-islands idiom (streak id = running count of
    non-growth months) that sql_monthly_growth's single-lag delta
    cannot express: a momentum dashboard wants "how long has this
    market grown uninterrupted", not just last month's sign.

    Exactness: everything is int64 — monthly revenue is exact cents,
    the up flag / island ids / streak lengths are integer window
    folds; no floats anywhere. Nations with zero up-months get
    longest_streak 0 via the COALESCEd island join (both engines).
    Scale: orders collapse to the |nations| x |months| frame in ONE
    keyed-join + hash agg pass (customer/nation are dimension joins);
    every window runs on that calendar-bounded frame."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    nm = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "ym")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    w = Window.partitionBy("n_name").orderBy("ym")
    flagged = nm.withColumn(
        "up",
        F.when(
            F.col("rev") > F.lag("rev").over(w), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "isl",
        F.sum(1 - F.col("up")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    base = flagged.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("up").cast("long").alias("n_up_months"),
    )
    runs = (
        flagged.where(F.col("up") == 1)
        .groupBy("n_name", "isl")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
        .groupBy("n_name")
        .agg(F.max("run_len").cast("long").alias("longest"))
    )
    return (
        base.join(runs, "n_name", "left")
        .select(
            "n_name", "n_months", "n_up_months",
            F.coalesce(F.col("longest"), F.lit(0)).cast("long")
            .alias("longest_up_streak"),
        )
        .orderBy("n_name")
    )


SQL_GROWTH_STREAKS_SQL = """
WITH nm AS (
  SELECT n.n_name,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS ym,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, year(o_orderdate) * 100 + month(o_orderdate)
),
flagged AS (
  SELECT n_name, ym, rev,
         CASE WHEN rev > LAG(rev) OVER (PARTITION BY n_name ORDER BY ym)
              THEN 1 ELSE 0 END AS up
  FROM nm
),
islands AS (
  SELECT n_name, ym, up,
         SUM(1 - up) OVER (PARTITION BY n_name ORDER BY ym
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS isl
  FROM flagged
),
base AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(up) AS BIGINT) AS n_up_months
  FROM islands GROUP BY n_name
),
runs AS (
  SELECT n_name, CAST(MAX(run_len) AS BIGINT) AS longest
  FROM (
    SELECT n_name, isl, CAST(COUNT(*) AS BIGINT) AS run_len
    FROM islands WHERE up = 1 GROUP BY n_name, isl
  ) GROUP BY n_name
)
SELECT b.n_name, b.n_months, b.n_up_months,
       CAST(COALESCE(r.longest, 0) AS BIGINT) AS longest_up_streak
FROM base b LEFT JOIN runs r ON b.n_name = r.n_name
ORDER BY b.n_name
"""


QUERIES = {
    "events_xi_correlation": events_xi_correlation,
    "events_cmh_test": events_cmh_test,
    "sql_revenue_bridge": sql_revenue_bridge,
    "sql_promo_uplift_did": sql_promo_uplift_did,
    "sql_growth_streaks": sql_growth_streaks,
}

ORACLES = {
    "events_xi_correlation": EVENTS_XI_CORRELATION_SQL,
    "events_cmh_test": EVENTS_CMH_TEST_SQL,
    "sql_revenue_bridge": SQL_REVENUE_BRIDGE_SQL,
    "sql_promo_uplift_did": SQL_PROMO_UPLIFT_DID_SQL,
    "sql_growth_streaks": SQL_GROWTH_STREAKS_SQL,
}
