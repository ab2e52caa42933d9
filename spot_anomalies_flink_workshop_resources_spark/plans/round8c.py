"""Round-8 third wave: distribution-distance completions, effect-size
statistics, inequality economics, lexical-richness classics, and a
graph rich-club audit.

Closes the gaps next to the existing families: TOTAL-VARIATION and
HELLINGER/BHATTACHARYYA distances complete the drift panel (PSI / KS /
JSD / QQ / Wasserstein / energy already registered) with the two
bounded metrics dashboards actually plot; CLIFF'S DELTA and COHEN'S D
give the weekend-shift tests (welch_t, mann-whitney) their effect-size
companions — the "is it big?" number next to "is it real?"; the THEIL
index and LORENZ deciles extend the inequality family (gini, pareto,
HHI) with the decomposable index and the curve the gini summarizes;
YULE'S K / Simpson's D give the text-quality family the classical
repetitiveness characteristic (burstiness measured contagion ACROSS
docs; K measures it WITHIN the frequency spectrum); and the RICH-CLUB
coefficient answers whether the co-purchase hubs interlink (the
assortativity readout at the top of the degree distribution).

Exactness follows the repo recipes: integer sufficient statistics on
the cents grid, |a*d - b*c| integer cross-multiplication instead of
float ratio comparison, libm ln for cross-engine transcendentals,
per-term 2^-20 quantization before any float sum (int64 fold is
order-free), and ONE final double division per statistic. The
reference's scope ends at fixed-threshold detection (AD.java:200);
this layer is beyond-reference by design (SURVEY.md §2 extension
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_Q20 = 1 << 20


# --------------------------------------------- total-variation distance


def events_total_variation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOTAL-VARIATION distance between each event type's VALUE
    distribution and the pooled distribution — the tightest bound on
    "how differently would ANY detector rule fire on this slice"
    (TV = sup_A |P_t(A) - P(A)| = 1/2 sum_c |p_c - q_c|), the bounded
    [0,1] companion to events_wasserstein's unbounded transport cost.

    Exactness: on the shared cents grid the cell term is the exact
    integer |n_tc*N - n_c*n_t|; cells where the type has no mass
    contribute n_c*n_t, which telescopes to n_t*(N - sum of covered
    n_c) — so the whole sum is int64 over the type's OWN cells (no
    dense grid), with ONE final double division by 2*n_t*N. Scale: two
    map-side-combinable hash aggs over events; the join frame is
    (type x covered cells), value-domain bounded; `cells` is
    |distinct cents|-sized and broadcast."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    cells = e.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    per_tc = e.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n_tc")
    )
    types = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    covered = (
        per_tc.join(F.broadcast(cells), "c")
        .join(F.broadcast(types), "event_type")
        .crossJoin(F.broadcast(tot))
        .groupBy("event_type", "n_t", "n_tot")
        .agg(
            F.sum(
                F.abs(
                    F.col("n_tc") * F.col("n_tot")
                    - F.col("n_all") * F.col("n_t")
                )
            )
            .cast("long")
            .alias("s_cov"),
            F.sum("n_all").cast("long").alias("mass_cov"),
        )
    )
    return covered.select(
        "event_type",
        F.col("n_t").alias("n_events"),
        (
            (
                F.col("s_cov")
                + F.col("n_t") * (F.col("n_tot") - F.col("mass_cov"))
            ).cast("double")
            / (
                F.lit(2.0)
                * F.col("n_t").cast("double")
                * F.col("n_tot").cast("double")
            )
        ).alias("tv_distance"),
    ).orderBy("event_type")


EVENTS_TOTAL_VARIATION_SQL = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
cells AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_all FROM ev GROUP BY c),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM ev),
per_tc AS (
  SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS n_tc FROM ev
  GROUP BY event_type, c
),
types AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ev
  GROUP BY event_type
),
covered AS (
  SELECT p.event_type, t.n_t, tot.n_tot,
         CAST(SUM(ABS(p.n_tc * tot.n_tot - ce.n_all * t.n_t)) AS BIGINT)
           AS s_cov,
         CAST(SUM(ce.n_all) AS BIGINT) AS mass_cov
  FROM per_tc p
  JOIN cells ce ON ce.c = p.c
  JOIN types t ON t.event_type = p.event_type
  CROSS JOIN tot
  GROUP BY p.event_type, t.n_t, tot.n_tot
)
SELECT event_type, n_t AS n_events,
       CAST(s_cov + n_t * (n_tot - mass_cov) AS DOUBLE)
         / (2.0 * CAST(n_t AS DOUBLE) * CAST(n_tot AS DOUBLE))
         AS tv_distance
FROM covered
ORDER BY event_type
"""


# --------------------------------------- Hellinger / Bhattacharyya


def events_hellinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELLINGER distance (and the Bhattacharyya coefficient it is
    built from) between each event type's VALUE distribution and the
    pooled one — the drift metric that is a true metric AND bounded,
    the standard pick when distances feed a downstream clustering.
    BC = sum_c sqrt(p_c * q_c); H = sqrt(1 - BC).

    Exactness: only cells the type covers contribute (sqrt(0*q) = 0);
    each term composes two correctly-rounded divisions, one product,
    one sqrt — IDENTICAL op order both engines — then quantizes onto
    the 2^-20 grid BEFORE the int64 sum (order-free). H clamps the
    1-BC radicand at 0 on both engines (quantization can overshoot 1
    by <= |cells| ulps). Scale: the same two hash aggs as the TV
    distance; join frame value-domain bounded."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    cells = e.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    per_tc = e.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n_tc")
    )
    types = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    p = F.col("n_tc").cast("double") / F.col("n_t").cast("double")
    q = F.col("n_all").cast("double") / F.col("n_tot").cast("double")
    term = F.floor(
        F.sqrt(p * q) * F.lit(float(_Q20)) + F.lit(0.5)
    ).cast("long")
    summed = (
        per_tc.join(F.broadcast(cells), "c")
        .join(F.broadcast(types), "event_type")
        .crossJoin(F.broadcast(tot))
        .select("event_type", "n_t", term.alias("t"))
        .groupBy("event_type", "n_t")
        .agg(F.sum("t").cast("long").alias("sq"))
    )
    bc = F.col("sq").cast("double") / F.lit(float(_Q20))
    return summed.select(
        "event_type",
        F.col("n_t").alias("n_events"),
        bc.alias("bhattacharyya"),
        F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc)).alias("hellinger"),
    ).orderBy("event_type")


EVENTS_HELLINGER_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
cells AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_all FROM ev GROUP BY c),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM ev),
per_tc AS (
  SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS n_tc FROM ev
  GROUP BY event_type, c
),
types AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ev
  GROUP BY event_type
),
summed AS (
  SELECT p.event_type, t.n_t,
         CAST(SUM(CAST(FLOOR(
             sqrt((CAST(p.n_tc AS DOUBLE) / CAST(t.n_t AS DOUBLE))
                  * (CAST(ce.n_all AS DOUBLE) / CAST(tot.n_tot AS DOUBLE)))
             * {float(_Q20)!r} + 0.5) AS BIGINT)) AS BIGINT) AS sq
  FROM per_tc p
  JOIN cells ce ON ce.c = p.c
  JOIN types t ON t.event_type = p.event_type
  CROSS JOIN tot
  GROUP BY p.event_type, t.n_t
)
SELECT event_type, n_t AS n_events,
       CAST(sq AS DOUBLE) / {float(_Q20)!r} AS bhattacharyya,
       sqrt(GREATEST(0.0, 1.0 - CAST(sq AS DOUBLE) / {float(_Q20)!r}))
         AS hellinger
FROM summed
ORDER BY event_type
"""


# ------------------------------------------------------ Cliff's delta


def events_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIFF'S DELTA of event VALUE, weekend vs weekday, per type — the
    nonparametric effect size behind events_mannwhitney's p-value:
    delta = (#{we > wd} - #{we < wd}) / (n_wd * n_we), read as "how
    often does a weekend draw beat a weekday draw".

    Exactness: all O(n1*n2) pair comparisons collapse onto the cents
    grid — for each weekend cell, the weekday mass strictly below is
    an EXCLUSIVE running int64 sum and the mass strictly above is the
    complement of the inclusive one, so gt/lt pair counts are exact
    int64 products summed in int64; ONE final double division. Scale:
    one data-sized hash agg to (type, cell, side) counts; the window
    runs per type over the value-domain-bounded grid."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").isin(1, 7).cast("int").alias("we"),  # Sun=1 Sat=7
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    grid = e.groupBy("event_type", "c").agg(
        F.sum(F.when(F.col("we") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_wd"),
        F.sum(F.when(F.col("we") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_we"),
    )
    w_excl = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_incl = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "event_type",
        "n_we",
        F.coalesce(F.sum("n_wd").over(w_excl), F.lit(0))
        .cast("long")
        .alias("wd_below"),
        F.sum("n_wd").over(w_incl).cast("long").alias("wd_upto"),
    )
    agg = cum.groupBy("event_type").agg(
        F.sum(F.col("n_we") * F.col("wd_below")).cast("long").alias("gt"),
        F.sum("n_we").cast("long").alias("n2"),
        F.max("wd_upto").cast("long").alias("n1"),
        F.sum(F.col("n_we") * F.col("wd_upto")).cast("long").alias("le_mass"),
    )
    # lt = sum n_we_c * (n1 - wd_upto(c)) = n2*n1 - le_mass
    lt = F.col("n2") * F.col("n1") - F.col("le_mass")
    agg = agg.where((F.col("n1") > 0) & (F.col("n2") > 0))
    return agg.select(
        "event_type",
        F.col("n1").alias("n_weekday"),
        F.col("n2").alias("n_weekend"),
        (
            (F.col("gt") - lt).cast("double")
            / (F.col("n1") * F.col("n2")).cast("double")
        ).alias("cliffs_delta"),
    ).orderBy("event_type")


EVENTS_CLIFFS_DELTA_SQL = """
WITH ev AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
grid AS (
  SELECT event_type, c,
         CAST(SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wd,
         CAST(SUM(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_we
  FROM ev GROUP BY event_type, c
),
cum AS (
  SELECT event_type, n_we,
         CAST(COALESCE(SUM(n_wd) OVER (PARTITION BY event_type ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS wd_below,
         CAST(SUM(n_wd) OVER (PARTITION BY event_type ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS wd_upto
  FROM grid
),
agg AS (
  SELECT event_type,
         CAST(SUM(n_we * wd_below) AS BIGINT) AS gt,
         CAST(SUM(n_we) AS BIGINT) AS n2,
         CAST(MAX(wd_upto) AS BIGINT) AS n1,
         CAST(SUM(n_we * wd_upto) AS BIGINT) AS le_mass
  FROM cum GROUP BY event_type
)
SELECT event_type, n1 AS n_weekday, n2 AS n_weekend,
       CAST(gt - (n2 * n1 - le_mass) AS DOUBLE)
         / CAST(n1 * n2 AS DOUBLE) AS cliffs_delta
FROM agg
WHERE n1 > 0 AND n2 > 0
ORDER BY event_type
"""


# -------------------------------------------------------- Cohen's d


def events_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S D of event VALUE, weekend vs weekday, per type — the
    pooled-variance standardized mean difference, events_welch_t's
    effect-size companion (the t answers "is the shift real", d
    answers "is it big enough to matter").

    Exactness: (n, sum, sum-of-squares) are exact int64 on the cents
    grid; means, per-group variances and the pooled variance compose
    the SAME sub-expressions in the SAME order on both engines
    (welch_t recipe), and d needs one sqrt. The cents scaling cancels
    in d (dimensionless); mean_diff is reported in value units (one
    division by 100). Scale: one map-side-combinable hash agg;
    everything after is |types|-sized."""
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    is_we = F.dayofweek("ts").isin(1, 7).cast("int")
    base = (
        e.select(F.col("event_type"), is_we.alias("we"), cents.alias("v"))
        .groupBy("event_type", "we")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("q"),
        )
    )
    wd = base.where(F.col("we") == 0).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("q").alias("q1"),
    )
    we_ = base.where(F.col("we") == 1).select(
        "event_type",
        F.col("n").alias("n2"),
        F.col("s").alias("s2"),
        F.col("q").alias("q2"),
    )
    # integer positive-variance guard (ADVICE r8): pooled SS computed
    # in floating point can round to a tiny NEGATIVE for zero-variance
    # groups, and DuckDB sqrt(<0) hard-errors where Spark returns NaN.
    # n*q - s^2 = n * (sum of squared deviations) exactly in int64, so
    # requiring the integer total > 0 guarantees the float radicand is
    # the sum of two non-negative terms, at least one positive.
    pos_var = (
        F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")
    ) + (F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2"))
    j = wd.join(we_, "event_type").where(
        (F.col("n1") > 1) & (F.col("n2") > 1) & (pos_var > 0)
    )
    m1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    m2 = F.col("s2").cast("double") / F.col("n2").cast("double")
    # sum of squared deviations per group: q - s^2/n, composed the
    # same way both engines (one division, one product, one subtract)
    ss1 = F.col("q1").cast("double") - (
        F.col("s1").cast("double") * m1
    )
    ss2 = F.col("q2").cast("double") - (
        F.col("s2").cast("double") * m2
    )
    sp2 = (ss1 + ss2) / (F.col("n1") + F.col("n2") - 2).cast("double")
    return j.select(
        "event_type",
        F.col("n1").alias("n_weekday"),
        F.col("n2").alias("n_weekend"),
        ((m2 - m1) / F.lit(100.0)).alias("mean_diff"),
        ((m2 - m1) / F.sqrt(sp2)).alias("cohens_d"),
    ).orderBy("event_type")


EVENTS_COHENS_D_SQL = """
WITH ev AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
base AS (
  SELECT event_type, we,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS q
  FROM ev GROUP BY event_type, we
),
j AS (
  SELECT a.event_type,
         a.n AS n1, a.s AS s1, a.q AS q1,
         b.n AS n2, b.s AS s2, b.q AS q2
  FROM base a JOIN base b
    ON a.event_type = b.event_type AND a.we = 0 AND b.we = 1
  WHERE a.n > 1 AND b.n > 1
    AND (a.n * a.q - a.s * a.s) + (b.n * b.q - b.s * b.s) > 0
),
staged AS (
  SELECT event_type, n1, n2,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
         CAST(q1 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
           AS ss1,
         CAST(q2 AS DOUBLE)
           - CAST(s2 AS DOUBLE) * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
           AS ss2
  FROM j
)
SELECT event_type, n1 AS n_weekday, n2 AS n_weekend,
       (m2 - m1) / 100.0 AS mean_diff,
       (m2 - m1) / sqrt((ss1 + ss2) / CAST(n1 + n2 - 2 AS DOUBLE))
         AS cohens_d
FROM staged
ORDER BY event_type
"""


# ------------------------------------------------------- Theil index


def sql_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL T index of order-revenue inequality across customers per
    nation — the decomposable inequality index (unlike gini, national
    Theils aggregate exactly into between/within components), the
    economics companion to sql_gini_revenue over the same base:
    T = (1/n) * sum_i r_i * ln(r_i) with r_i = x_i * n / X.

    Exactness: x_i is exact cents; each ratio composes one exact-int
    product cast once and one correctly-rounded division; ln runs
    through the libm twin (functions/libm.py — bit-matches DuckDB);
    each term quantizes onto the 2^-20 grid BEFORE the per-nation
    int64 sum. ONE final division by 2^20 * n. Scale: one data-sized
    hash agg to the customer dimension; the libm pass is an
    Arrow-vectorized map over the dimension frame."""
    from ..functions.libm import libm_log

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("x")
        )
    )
    nat = per_cust.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("x").cast("long").alias("tot"),
    )
    r = (F.col("x").cast("double") * F.col("n_cust").cast("double")) / F.col(
        "tot"
    ).cast("double")
    term = F.floor(
        r * libm_log(r) * F.lit(float(_Q20)) + F.lit(0.5)
    ).cast("long")
    summed = (
        per_cust.join(F.broadcast(nat), "n_name")
        .select("n_name", "n_cust", term.alias("t"))
        .groupBy("n_name", "n_cust")
        .agg(F.sum("t").cast("long").alias("sq"))
    )
    return summed.select(
        F.col("n_name").alias("nation"),
        F.col("n_cust").alias("n_customers"),
        (
            F.col("sq").cast("double")
            / (F.lit(float(_Q20)) * F.col("n_cust").cast("double"))
        ).alias("theil_t"),
    ).orderBy("nation")


SQL_THEIL_INDEX_SQL = f"""
WITH per_cust AS (
  SELECT n.n_name, c.c_custkey,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, c.c_custkey
),
nat AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(x) AS BIGINT) AS tot
  FROM per_cust GROUP BY n_name
),
summed AS (
  SELECT p.n_name, nat.n_cust,
         CAST(SUM(CAST(FLOOR(
             ((CAST(p.x AS DOUBLE) * CAST(nat.n_cust AS DOUBLE))
               / CAST(nat.tot AS DOUBLE))
             * ln((CAST(p.x AS DOUBLE) * CAST(nat.n_cust AS DOUBLE))
                  / CAST(nat.tot AS DOUBLE))
             * {float(_Q20)!r} + 0.5) AS BIGINT)) AS BIGINT) AS sq
  FROM per_cust p JOIN nat ON nat.n_name = p.n_name
  GROUP BY p.n_name, nat.n_cust
)
SELECT n_name AS nation, n_cust AS n_customers,
       CAST(sq AS DOUBLE) / ({float(_Q20)!r} * CAST(n_cust AS DOUBLE))
         AS theil_t
FROM summed
ORDER BY nation
"""


# --------------------------------------------------- Lorenz deciles


def sql_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE by customer decile: rank buyers by total order
    revenue ascending, cut into 10 equal-count bins, report each bin's
    revenue share and the cumulative share — the curve sql_gini_revenue
    integrates, in the form finance reviews actually read ("the top
    10% of customers carry X% of revenue").

    Exactness: decile assignment is the integer formula
    floor((rank-1)*10/n) over a DETERMINISTIC (revenue, custkey) order
    (no NTILE — engine tie-handling never consulted); shares are exact
    int64 cents with cumulative int64 window sums over the 10-row
    frame, ONE division each. Scale: one data-sized hash agg to the
    customer dimension; the ranking window is dimension-sized (at
    100 TB: a two-pass partition-ranked sort; the decile audit itself
    stays dimension-bounded)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("x")
    )
    n_tot = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("tot"),
    )
    w = Window.orderBy(F.asc("x"), F.asc("o_custkey"))
    ranked = per_cust.select(
        "x", (F.row_number().over(w) - 1).cast("long").alias("rk")
    )
    binned = (
        ranked.crossJoin(F.broadcast(n_tot))
        .select(
            # integer DIV both engines: DuckDB CAST(double AS BIGINT)
            # ROUNDS while Spark's cast truncates — never compare there
            F.expr("(rk * 10) DIV n")
            .cast("long")
            .alias("decile"),
            "x",
            "n",
            "tot",
        )
        .groupBy("decile", "n", "tot")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("x").cast("long").alias("cents"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        binned.withColumn(
            "cum_cents", F.sum("cents").over(wcum).cast("long")
        )
        .select(
            "decile",
            "n_customers",
            (F.col("cents").cast("double") / F.lit(100.0)).alias(
                "decile_revenue"
            ),
            (
                F.col("cents").cast("double") / F.col("tot").cast("double")
            ).alias("revenue_share"),
            (
                F.col("cum_cents").cast("double")
                / F.col("tot").cast("double")
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


SQL_LORENZ_DECILES_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY o_custkey
),
n_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS tot
  FROM per_cust
),
ranked AS (
  SELECT x,
         CAST(ROW_NUMBER() OVER (ORDER BY x ASC, o_custkey ASC) - 1
              AS BIGINT) AS rk
  FROM per_cust
),
binned AS (
  SELECT CAST((rk * 10) // n AS BIGINT) AS decile, n, tot,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(x) AS BIGINT) AS cents
  FROM ranked CROSS JOIN n_tot
  GROUP BY CAST((rk * 10) // n AS BIGINT), n, tot
)
SELECT decile, n_customers,
       CAST(cents AS DOUBLE) / 100.0 AS decile_revenue,
       CAST(cents AS DOUBLE) / CAST(tot AS DOUBLE) AS revenue_share,
       CAST(CAST(SUM(cents) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
FROM binned
ORDER BY decile
"""


# ------------------------------------------- Yule's K / Simpson's D


def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YULE'S K characteristic and SIMPSON'S D of the token-frequency
    spectrum per source — the classical lexical-repetitiveness
    constants (K is length-invariant; template/boilerplate-heavy
    sources jump out), the within-spectrum companion to
    text_burstiness's across-document VMR.
    K = 10^4 * (S2 - S1) / S1^2, D = (S2 - S1) / (S1 * (S1 - 1))
    with S1 = total tokens, S2 = sum of squared term frequencies.

    Exactness: S1, S2, vocabulary size and the hapax count are exact
    int64 off one (source, token) hash agg; every output is ONE
    division of exact integers. Sources with S1 <= 1 are filtered
    structurally on BOTH engines (D's denominator S1*(S1-1) is zero
    there; ANSI Spark would throw where DuckDB yields NULL — ADVICE
    r8). Scale: one token explode + two map-side-combinable hash
    aggs; the spectrum frame is vocab x sources bounded."""
    from ..operators.text import token_arrays

    toks = token_arrays(
        load_table(spark, sf_dir, "documents"), cache_key=sf_dir
    ).select("source", F.explode("toks").alias("tok"))
    tf = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    agg = tf.groupBy("source").agg(
        F.sum("f").cast("long").alias("s1"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("long")
        .alias("v1"),
    )
    # structural guard: simpson_d divides by s1*(s1-1) — a 1-token
    # source would make ANSI Spark throw DIVIDE_BY_ZERO (ADVICE r8)
    agg = agg.where(F.col("s1") > 1)
    return agg.select(
        "source",
        F.col("s1").alias("n_tokens"),
        F.col("v").alias("vocab"),
        (
            F.lit(10000.0)
            * (F.col("s2") - F.col("s1")).cast("double")
            / (F.col("s1") * F.col("s1")).cast("double")
        ).alias("yule_k"),
        (
            (F.col("s2") - F.col("s1")).cast("double")
            / (F.col("s1") * (F.col("s1") - 1)).cast("double")
        ).alias("simpson_d"),
        (
            F.col("v1").cast("double") / F.col("v").cast("double")
        ).alias("hapax_share"),
    ).orderBy("source")


TEXT_YULE_K_SQL = """
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
tf AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks GROUP BY source, tok
),
agg AS (
  SELECT source,
         CAST(SUM(f) AS BIGINT) AS s1,
         CAST(SUM(f * f) AS BIGINT) AS s2,
         CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1
  FROM tf GROUP BY source
)
SELECT source, s1 AS n_tokens, v AS vocab,
       10000.0 * CAST(s2 - s1 AS DOUBLE) / CAST(s1 * s1 AS DOUBLE)
         AS yule_k,
       CAST(s2 - s1 AS DOUBLE) / CAST(s1 * (s1 - 1) AS DOUBLE)
         AS simpson_d,
       CAST(v1 AS DOUBLE) / CAST(v AS DOUBLE) AS hapax_share
FROM agg
WHERE s1 > 1
ORDER BY source
"""


# ------------------------------------------------- rich-club audit


def sql_copurchase_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RICH-CLUB coefficient of the co-purchase graph at degree
    thresholds 2/4/8/16: among parts with degree > k, what fraction of
    possible edges exist — "do the hub products interlink, or does the
    catalog star around them?", the top-of-distribution readout the
    global assortativity number blurs.

    Exactness: degrees, qualifying-node counts and club edge counts
    are exact int64 off the SHARED co-purchase edge frame
    (relational._copurchase_edges — session-cached, VERDICT r7 #5);
    phi is ONE division. Scale: degree agg + two keyed joins on the
    support-thresholded edge frame (never data-sized); the threshold
    explode is x4 on the already-bounded frames."""
    from .relational import _copurchase_edges

    ks = [2, 4, 8, 16]
    e = _copurchase_edges(spark, sf_dir).select("x", "y")
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    kdf = spark.createDataFrame(
        [(k,) for k in ks], "k_threshold int"
    )
    nodes_k = (
        deg.crossJoin(F.broadcast(kdf))
        .where(F.col("deg") > F.col("k_threshold"))
        .groupBy("k_threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    edges_k = (
        e.join(deg.withColumnRenamed("node", "x").withColumnRenamed(
            "deg", "dx"
        ), "x")
        .join(
            deg.withColumnRenamed("node", "y").withColumnRenamed(
                "deg", "dy"
            ),
            "y",
        )
        .crossJoin(F.broadcast(kdf))
        .where(
            (F.col("dx") > F.col("k_threshold"))
            & (F.col("dy") > F.col("k_threshold"))
        )
        .groupBy("k_threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    return (
        nodes_k.join(edges_k, "k_threshold", "left")
        .select(
            "k_threshold",
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0))
            .cast("long")
            .alias("n_edges"),
        )
        .where(F.col("n_nodes") >= 2)
        .withColumn(
            "phi",
            (F.lit(2.0) * F.col("n_edges").cast("double"))
            / (F.col("n_nodes") * (F.col("n_nodes") - 1)).cast("double"),
        )
        .orderBy("k_threshold")
    )


def _sql_copurchase_richclub_sql() -> str:
    from .relational import _COPURCHASE_EDGES_CTE

    return (
        _COPURCHASE_EDGES_CTE
        + """,
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT x AS node FROM edges UNION ALL SELECT y AS node FROM edges
  ) GROUP BY node
),
ks AS (SELECT unnest([2, 4, 8, 16]) AS k_threshold),
nodes_k AS (
  SELECT ks.k_threshold, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM deg CROSS JOIN ks WHERE deg.deg > ks.k_threshold
  GROUP BY ks.k_threshold
),
edges_k AS (
  SELECT ks.k_threshold, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM edges e
  JOIN deg dx ON dx.node = e.x
  JOIN deg dy ON dy.node = e.y
  CROSS JOIN ks
  WHERE dx.deg > ks.k_threshold AND dy.deg > ks.k_threshold
  GROUP BY ks.k_threshold
)
SELECT n.k_threshold, n.n_nodes,
       CAST(COALESCE(e.n_edges, 0) AS BIGINT) AS n_edges,
       (2.0 * CAST(COALESCE(e.n_edges, 0) AS DOUBLE))
         / CAST(n.n_nodes * (n.n_nodes - 1) AS DOUBLE) AS phi
FROM nodes_k n LEFT JOIN edges_k e ON e.k_threshold = n.k_threshold
WHERE n.n_nodes >= 2
ORDER BY n.k_threshold
"""
    )


# ------------------------------------------------- Grubbs outlier test


def events_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRUBBS statistic on the daily event-count series per type: the
    maximum studentized deviate G = max|x - mean| / sd and the day that
    achieves it — the single-outlier screen a capacity review runs
    before trusting a mean (events_robust_outliers flags rows; this
    scores the SERIES and names the worst day).

    Exactness: daily counts are int64; the argmax day is selected by
    the INTEGER cross-product |x*n - S| (no float ever compared, ties
    broken by earliest day); mean/sd compose the welch_t recipe from
    int64 (n, S, Q), and G = dev_num / (n * sd) is two divisions + one
    sqrt in fixed order. Scale: one data-sized hash agg to (type, day);
    everything after is calendar-bounded."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    dev = (
        daily.join(F.broadcast(stats), "event_type")
        # n > 1 AND positive variance (integer form n*q - s*s > 0):
        # a constant series has no G and would hit ANSI divide-by-zero
        .where(
            (F.col("n") > 1)
            & (F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0)
        )
        .select(
            "event_type",
            "day",
            "n",
            "s",
            "q",
            F.abs(F.col("x") * F.col("n") - F.col("s"))
            .cast("long")
            .alias("dev_num"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("dev_num"), F.asc("day")
    )
    top = dev.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    m = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("q").cast("double") / F.col("n").cast("double") - m * m
    ) * (F.col("n").cast("double") / (F.col("n") - 1).cast("double"))
    return top.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("day").alias("peak_day"),
        (
            F.col("dev_num").cast("double")
            / (F.col("n").cast("double") * F.sqrt(var))
        ).alias("g_stat"),
    ).orderBy("event_type")


EVENTS_GRUBBS_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS q
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day, st.n, st.s, st.q,
         CAST(ABS(d.x * st.n - st.s) AS BIGINT) AS dev_num,
         ROW_NUMBER() OVER (PARTITION BY d.event_type
                            ORDER BY ABS(d.x * st.n - st.s) DESC,
                                     d.day ASC) AS rn
  FROM daily d JOIN stats st ON st.event_type = d.event_type
  WHERE st.n > 1 AND st.n * st.q - st.s * st.s > 0
)
SELECT event_type, n AS n_days, day AS peak_day,
       CAST(dev_num AS DOUBLE)
         / (CAST(n AS DOUBLE)
            * sqrt((CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                   * (CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE))))
         AS g_stat
FROM dev WHERE rn = 1
ORDER BY event_type
"""


# -------------------------------------------------- McNemar activity


def events_mcnemar_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR test of paired user activity, first week vs second week
    of the span, per event type — the paired pre/post screen ("did the
    SAME users change behavior?") that the independent two-sample tests
    (welch, mannwhitney) cannot answer. chi2 = (b - c)^2 / (b + c) over
    the discordant pairs b = active-then-quiet, c = quiet-then-active.

    Exactness: week membership is integer day arithmetic off the
    global min date (datediff DIV 7 — engine week-of-year rules never
    consulted); b and c are exact int64; chi2 is ONE division of exact
    integers. Scale: one data-sized hash agg to (type, user, week);
    the pair frame is user-dimension bounded."""
    e = load_table(spark, sf_dir, "events")
    d0 = e.agg(F.min(F.to_date("ts")).alias("d0"))
    wk = (
        e.crossJoin(F.broadcast(d0))
        .select(
            "event_type",
            "user_id",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("d0")) / 7
            )
            .cast("long")
            .alias("wk"),
        )
        .where(F.col("wk").isin(0, 1))
        .distinct()
    )
    flags = wk.groupBy("event_type", "user_id").agg(
        F.max(F.when(F.col("wk") == 0, 1).otherwise(0)).alias("w1"),
        F.max(F.when(F.col("wk") == 1, 1).otherwise(0)).alias("w2"),
    )
    agg = flags.groupBy("event_type").agg(
        F.sum(F.when((F.col("w1") == 1) & (F.col("w2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("w1") == 0) & (F.col("w2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    return agg.where(F.col("b") + F.col("c") > 0).select(
        "event_type",
        "n_users",
        F.col("b").alias("lapsed"),
        F.col("c").alias("adopted"),
        (
            ((F.col("b") - F.col("c")) * (F.col("b") - F.col("c"))).cast(
                "double"
            )
            / (F.col("b") + F.col("c")).cast("double")
        ).alias("mcnemar_chi2"),
    ).orderBy("event_type")


EVENTS_MCNEMAR_SQL = """
WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
wk AS (
  SELECT DISTINCT event_type, user_id,
         CAST(FLOOR(date_diff('day', d0.d0, CAST(ts AS DATE)) / 7)
              AS BIGINT) AS wk
  FROM events CROSS JOIN d0
  WHERE CAST(FLOOR(date_diff('day', d0.d0, CAST(ts AS DATE)) / 7)
             AS BIGINT) IN (0, 1)
),
flags AS (
  SELECT event_type, user_id,
         MAX(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS w1,
         MAX(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS w2
  FROM wk GROUP BY event_type, user_id
),
agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN w1 = 1 AND w2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN w1 = 0 AND w2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM flags GROUP BY event_type
)
SELECT event_type, n_users, b AS lapsed, c AS adopted,
       CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE)
         AS mcnemar_chi2
FROM agg WHERE b + c > 0
ORDER BY event_type
"""


# ---------------------------------------------------- date-sanity DQ


def dq_date_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE-ORDERING sanity audit across orders x lineitem: lines
    shipped BEFORE their order date (hard impossibility), shipped more
    than 120 days after (stale fulfilment), and orders dated outside
    the warehouse's observed calendar years — the cross-table DQ
    screen next to dq_referential_integrity's key checks.

    Exactness: every class is an integer date comparison counted in
    int64; shares are ONE division. Scale: one keyed equi-join on
    orderkey (never data x data), map-side-combinable count agg."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff(F.col("sd"), F.col("od")).cast("long").alias("lag")
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("lag") < 0, 1).otherwise(0))
        .cast("long")
        .alias("ship_before_order"),
        F.sum(F.when(F.col("lag") > 120, 1).otherwise(0))
        .cast("long")
        .alias("ship_lag_over_120d"),
        F.max("lag").cast("long").alias("max_lag_days"),
    )
    return agg.select(
        "n_lines",
        "ship_before_order",
        "ship_lag_over_120d",
        "max_lag_days",
        (
            F.col("ship_lag_over_120d").cast("double")
            / F.col("n_lines").cast("double")
        ).alias("stale_share"),
    )


DQ_DATE_SANITY_SQL = """
WITH j AS (
  SELECT CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN lag < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS ship_before_order,
       CAST(SUM(CASE WHEN lag > 120 THEN 1 ELSE 0 END) AS BIGINT)
         AS ship_lag_over_120d,
       CAST(MAX(lag) AS BIGINT) AS max_lag_days,
       CAST(SUM(CASE WHEN lag > 120 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS stale_share
FROM j
"""


# --------------------------------------------------- CR4 concentration


def sql_cr4_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CR4 CONCENTRATION RATIO per region: the revenue share of the
    four largest suppliers — the antitrust-style market-structure
    number sql_supplier_hhi summarizes into one index (CR4 reads the
    head directly; regulators quote both).

    Exactness: supplier revenue is exact int64 cents; the top-4 pick
    is a deterministic (revenue DESC, suppkey ASC) row_number; CR4 is
    ONE division. Scale: lineitem collapses to the supplier dimension
    in one hash agg; nation/region dims broadcast; the ranking window
    partitions by region over the supplier-dimension frame."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(F.sum(cents).cast("long").alias("rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("r_name", "l_suppkey", "rev")
    )
    w = Window.partitionBy("r_name").orderBy(
        F.desc("rev"), F.asc("l_suppkey")
    )
    ranked = per_supp.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("rev").cast("long").alias("tot"),
            F.sum(F.when(F.col("rn") <= 4, F.col("rev")).otherwise(0))
            .cast("long")
            .alias("top4"),
        )
        .select(
            F.col("r_name").alias("region"),
            "n_suppliers",
            (F.col("top4").cast("double") / F.lit(100.0)).alias(
                "top4_revenue"
            ),
            (
                F.col("top4").cast("double") / F.col("tot").cast("double")
            ).alias("cr4"),
        )
        .orderBy("region")
    )


SQL_CR4_CONCENTRATION_SQL = """
WITH per_supp AS (
  SELECT r.r_name, li.l_suppkey,
         CAST(SUM(CAST(FLOOR(li.l_extendedprice * (1.0 - li.l_discount)
                             * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem li
  JOIN supplier s ON s.s_suppkey = li.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, li.l_suppkey
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY r_name
                               ORDER BY rev DESC, l_suppkey ASC) AS rn
  FROM per_supp
)
SELECT r_name AS region,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CASE WHEN rn <= 4 THEN rev ELSE 0 END) AS DOUBLE) / 100.0
         AS top4_revenue,
       CAST(SUM(CASE WHEN rn <= 4 THEN rev ELSE 0 END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS cr4
FROM ranked
GROUP BY r_name
ORDER BY region
"""


# ---------------------------------------- Laspeyres / Paasche / Fisher


def sql_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LASPEYRES, PAASCHE and FISHER price indices between the first
    and last order year, over parts traded in BOTH — the classical
    "how much did the catalog's price level move" decomposition
    (sql_monthly_growth tracks revenue; these separate price from
    volume).

    Exactness: per-(part, year) quantity and revenue-cents are exact
    int64; base-period value sums (sum p0*q0 = sum rev0, sum p1*q1 =
    sum rev1) are EXACT integers by construction; the two cross terms
    (p1*q0, p0*q1) compose one division + one product per part,
    quantized onto the 2^-20 grid before the int64 fold. Fisher is one
    sqrt of the two ratios. Scale: one data-sized hash agg to the
    (part, year) frame; everything after is part-dimension bounded."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
        "long"
    )
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    py = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_partkey", "yr")
        .agg(
            F.sum(qty).cast("long").alias("q"),
            F.sum(cents).cast("long").alias("rev"),
        )
    )
    yrs = py.agg(
        F.min("yr").cast("long").alias("y0"),
        F.max("yr").cast("long").alias("y1"),
    )
    both = (
        py.crossJoin(F.broadcast(yrs))
        .where((F.col("yr") == F.col("y0")) | (F.col("yr") == F.col("y1")))
        .groupBy("l_partkey", "y0", "y1")
        .agg(
            F.sum(F.when(F.col("yr") == F.col("y0"), F.col("q"))).cast(
                "long"
            ).alias("q0"),
            F.sum(F.when(F.col("yr") == F.col("y0"), F.col("rev"))).cast(
                "long"
            ).alias("rev0"),
            F.sum(F.when(F.col("yr") == F.col("y1"), F.col("q"))).cast(
                "long"
            ).alias("q1"),
            F.sum(F.when(F.col("yr") == F.col("y1"), F.col("rev"))).cast(
                "long"
            ).alias("rev1"),
        )
        .where(
            F.col("q0").isNotNull()
            & F.col("q1").isNotNull()
            & (F.col("q0") > 0)
            & (F.col("q1") > 0)
        )
    )
    p0 = F.col("rev0").cast("double") / F.col("q0").cast("double")
    p1 = F.col("rev1").cast("double") / F.col("q1").cast("double")
    t10 = F.floor(
        p1 * F.col("q0").cast("double") * F.lit(float(_Q20)) + F.lit(0.5)
    ).cast("long")
    t01 = F.floor(
        p0 * F.col("q1").cast("double") * F.lit(float(_Q20)) + F.lit(0.5)
    ).cast("long")
    agg = both.groupBy("y0", "y1").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev0").cast("long").alias("v00"),
        F.sum("rev1").cast("long").alias("v11"),
        F.sum(t10).cast("long").alias("v10q"),
        F.sum(t01).cast("long").alias("v01q"),
    )
    lasp = (F.col("v10q").cast("double") / F.lit(float(_Q20))) / F.col(
        "v00"
    ).cast("double")
    paas = F.col("v11").cast("double") / (
        F.col("v01q").cast("double") / F.lit(float(_Q20))
    )
    return agg.select(
        F.col("y0").alias("base_year"),
        F.col("y1").alias("compare_year"),
        "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


SQL_PRICE_INDEX_FISHER_SQL = f"""
WITH py AS (
  SELECT l.l_partkey, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS q,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_partkey, CAST(year(o.o_orderdate) AS BIGINT)
),
yrs AS (
  SELECT CAST(MIN(yr) AS BIGINT) AS y0, CAST(MAX(yr) AS BIGINT) AS y1
  FROM py
),
common_parts AS (
  SELECT l_partkey, y0, y1,
         CAST(SUM(CASE WHEN yr = y0 THEN q END) AS BIGINT) AS q0,
         CAST(SUM(CASE WHEN yr = y0 THEN rev END) AS BIGINT) AS rev0,
         CAST(SUM(CASE WHEN yr = y1 THEN q END) AS BIGINT) AS q1,
         CAST(SUM(CASE WHEN yr = y1 THEN rev END) AS BIGINT) AS rev1
  FROM py CROSS JOIN yrs
  WHERE yr = y0 OR yr = y1
  GROUP BY l_partkey, y0, y1
  HAVING SUM(CASE WHEN yr = y0 THEN q END) > 0
     AND SUM(CASE WHEN yr = y1 THEN q END) > 0
),
agg AS (
  SELECT y0, y1, CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(rev0) AS BIGINT) AS v00,
         CAST(SUM(rev1) AS BIGINT) AS v11,
         CAST(SUM(CAST(FLOOR(
             (CAST(rev1 AS DOUBLE) / CAST(q1 AS DOUBLE))
             * CAST(q0 AS DOUBLE) * {float(_Q20)!r} + 0.5) AS BIGINT))
           AS BIGINT) AS v10q,
         CAST(SUM(CAST(FLOOR(
             (CAST(rev0 AS DOUBLE) / CAST(q0 AS DOUBLE))
             * CAST(q1 AS DOUBLE) * {float(_Q20)!r} + 0.5) AS BIGINT))
           AS BIGINT) AS v01q
  FROM common_parts GROUP BY y0, y1
)
SELECT y0 AS base_year, y1 AS compare_year, n_parts,
       (CAST(v10q AS DOUBLE) / {float(_Q20)!r}) / CAST(v00 AS DOUBLE)
         AS laspeyres,
       CAST(v11 AS DOUBLE) / (CAST(v01q AS DOUBLE) / {float(_Q20)!r})
         AS paasche,
       sqrt(((CAST(v10q AS DOUBLE) / {float(_Q20)!r})
             / CAST(v00 AS DOUBLE))
            * (CAST(v11 AS DOUBLE)
               / (CAST(v01q AS DOUBLE) / {float(_Q20)!r}))) AS fisher
FROM agg
"""


# ------------------------------------------------ SQ8 distortion audit


def simsearch_sq8_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR-QUANTIZATION (SQ8) distortion audit: quantize every
    embedding dimension to 8 bits over its observed [min, max] range
    and report per-dimension reconstruction MSE plus the worst cell
    error — the index-health read for the 4x-smaller SQ index family,
    next to simsearch_pq_distortion's codebook view (SQ8 is what
    FAISS/IVF deployments try FIRST; the audit says whether 8 bits is
    enough per axis).

    Exactness: per-dim min/max are exact float comparisons; the code
    floor((x - mn) / (mx - mn) * 255 + 0.5) and the reconstruction
    compose identically on both engines; squared errors quantize onto
    the 2^-40 grid before the int64 fold (errors are bounded by half a
    quantization step squared, so terms are tiny and the fold exact).
    Scale: the dim explode is |rows| x 64 narrow longs; per-dim stats
    and the error agg are both map-side-combinable hash aggs keyed by
    the 64-value dim."""
    dim = 64
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "d", "x"
        ),
    )
    rng = flat.groupBy("d").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    q40 = float(1 << 40)
    code = F.floor(
        (F.col("x") - F.col("mn"))
        / (F.col("mx") - F.col("mn"))
        * F.lit(255.0)
        + F.lit(0.5)
    ).cast("long")
    joined = flat.join(F.broadcast(rng), "d").where(
        F.col("mx") > F.col("mn")
    )
    recon = F.col("mn") + F.col("code").cast("double") * (
        F.col("mx") - F.col("mn")
    ) / F.lit(255.0)
    errq = F.floor(
        (F.col("x") - F.col("recon"))
        * (F.col("x") - F.col("recon"))
        * F.lit(q40)
        + F.lit(0.5)
    ).cast("long")
    staged = joined.withColumn("code", code).withColumn("recon", recon)
    agg = staged.withColumn("errq", errq).groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("errq").cast("long").alias("se"),
        F.max("errq").cast("long").alias("worst"),
    )
    return agg.select(
        F.col("d").cast("long").alias("dim"),
        "n",
        (
            F.col("se").cast("double")
            / (F.lit(q40) * F.col("n").cast("double"))
        ).alias("mse"),
        (F.col("worst").cast("double") / F.lit(q40)).alias("worst_sq_err"),
    ).orderBy("dim")


def _simsearch_sq8_distortion_sql(dim: int = 64) -> str:
    q40 = float(1 << 40)
    return f"""
WITH flat AS (
  SELECT vec_id, g.i - 1 AS d, embedding[g.i]::DOUBLE AS x
  FROM embeddings, generate_series(1, {dim}) AS g(i)
),
rng AS (
  SELECT d, MIN(x) AS mn, MAX(x) AS mx FROM flat GROUP BY d
),
staged AS (
  SELECT f.d, f.x, r.mn, r.mx,
         CAST(FLOOR((f.x - r.mn) / (r.mx - r.mn) * 255.0 + 0.5)
              AS BIGINT) AS code
  FROM flat f JOIN rng r ON r.d = f.d
  WHERE r.mx > r.mn
),
errs AS (
  SELECT d,
         CAST(FLOOR((x - (mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0))
                    * (x - (mn + CAST(code AS DOUBLE) * (mx - mn) / 255.0))
                    * {q40!r} + 0.5) AS BIGINT) AS errq
  FROM staged
)
SELECT CAST(d AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(errq) AS DOUBLE) / ({q40!r} * CAST(COUNT(*) AS DOUBLE))
         AS mse,
       CAST(MAX(errq) AS DOUBLE) / {q40!r} AS worst_sq_err
FROM errs GROUP BY d
ORDER BY dim
"""


QUERIES = {
    "events_total_variation": events_total_variation,
    "events_hellinger": events_hellinger,
    "events_cliffs_delta": events_cliffs_delta,
    "events_cohens_d": events_cohens_d,
    "sql_theil_index": sql_theil_index,
    "sql_lorenz_deciles": sql_lorenz_deciles,
    "text_yule_k": text_yule_k,
    "sql_copurchase_richclub": sql_copurchase_richclub,
    "events_grubbs": events_grubbs,
    "events_mcnemar_activity": events_mcnemar_activity,
    "dq_date_sanity": dq_date_sanity,
    "sql_cr4_concentration": sql_cr4_concentration,
    "sql_price_index_fisher": sql_price_index_fisher,
    "simsearch_sq8_distortion": simsearch_sq8_distortion,
}

ORACLES = {
    "events_total_variation": EVENTS_TOTAL_VARIATION_SQL,
    "events_hellinger": EVENTS_HELLINGER_SQL,
    "events_cliffs_delta": EVENTS_CLIFFS_DELTA_SQL,
    "events_cohens_d": EVENTS_COHENS_D_SQL,
    "sql_theil_index": SQL_THEIL_INDEX_SQL,
    "sql_lorenz_deciles": SQL_LORENZ_DECILES_SQL,
    "text_yule_k": TEXT_YULE_K_SQL,
    "sql_copurchase_richclub": _sql_copurchase_richclub_sql(),
    "events_grubbs": EVENTS_GRUBBS_SQL,
    "events_mcnemar_activity": EVENTS_MCNEMAR_SQL,
    "dq_date_sanity": DQ_DATE_SANITY_SQL,
    "sql_cr4_concentration": SQL_CR4_CONCENTRATION_SQL,
    "sql_price_index_fisher": SQL_PRICE_INDEX_FISHER_SQL,
    "simsearch_sq8_distortion": _simsearch_sq8_distortion_sql(),
}
