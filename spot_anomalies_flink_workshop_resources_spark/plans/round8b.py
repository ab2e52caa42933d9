"""Round-8 second wave: distribution-drift distances, residual
diagnostics, invoice/price data-quality screens, a PQ index-health
audit, and a stateful streaming EWMA alert.

Fills the remaining gaps next to the existing drift family (PSI / KS /
JSD / QQ already registered): the WASSERSTEIN-1 distance (the
transport-cost drift metric those ratios can't see), the ENERGY
DISTANCE two-sample test (weekday vs weekend), DURBIN-WATSON residual
autocorrelation after the OLS detrend (is events_trend_ols's fit
believable?), and the TURNING-POINTS randomness screen. The DQ pair
covers the classic warehouse fraud/consistency screens (duplicate
same-day invoices; unit-price plausibility vs the catalog price). The
simsearch entry closes the index-health loop: per-subspace PQ
reconstruction distortion — the number you read before trusting
ivfpq's ADC ranking. The streaming entry raises the EWMA baseline
(events_ewma) into a continuously-maintained complete-mode aggregate
with a deviation alert count.

Exactness follows the repo recipes (integer sufficient statistics on
the cents grid, ordered folds via aggregate/list_reduce with identical
IEEE op order, decimal staging for money means, one final double
division; sqrt is correctly rounded so it needs no libm). The
reference's scope ends at fixed-threshold detection (AD.java:200);
this layer is beyond-reference by design (SURVEY.md §2 extension
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_Q40 = float(1 << 40)


# ------------------------------------------------ Wasserstein-1 drift


def events_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WASSERSTEIN-1 (earth-mover) distance between each event type's
    VALUE distribution and the pooled distribution — the transport-cost
    drift metric that, unlike PSI/KS/JSD, weighs HOW FAR probability
    mass moved, not just that it moved: W1 = integral of |F_t - F_all|
    over the value axis.

    Exactness: on the shared cents grid the CDF difference at cell c is
    the exact rational |cum_t*N - cum_all*n_t| / (n_t*N); the integral
    is a sum over grid gaps of that integer numerator times the integer
    gap width, so everything up to ONE final double division is int64
    (|numerator| <= n_t*N <= N^2/|types| ~ 2e11 at sf1 and the gap-sum
    telescopes to max_diff * value_range — comfortably inside int64
    through sf10). Scale: two map-side-combinable hash aggs over
    events; the grid frame is |types| x |distinct cents| (value-domain
    bounded), and the window runs per type over that bounded grid."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    cells = e.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    types = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    per_tc = e.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n_tc")
    )
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    grid = (
        types.crossJoin(F.broadcast(cells))
        .join(per_tc, ["event_type", "c"], "left")
        .select(
            "event_type",
            "n_t",
            "c",
            "n_all",
            F.coalesce(F.col("n_tc"), F.lit(0)).cast("long").alias("n_tc"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wlead = Window.partitionBy("event_type").orderBy("c")
    cum = grid.select(
        "event_type",
        "n_t",
        F.sum("n_tc").over(w).cast("long").alias("cum_t"),
        F.sum("n_all").over(w).cast("long").alias("cum_all"),
        (F.lead("c").over(wlead) - F.col("c")).cast("long").alias("gap"),
    ).where(F.col("gap").isNotNull())
    contrib = cum.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_t",
        "n_tot",
        (
            F.abs(
                F.col("cum_t") * F.col("n_tot")
                - F.col("cum_all") * F.col("n_t")
            )
            * F.col("gap")
        )
        .cast("long")
        .alias("a"),
    )
    return (
        contrib.groupBy("event_type", "n_t", "n_tot")
        .agg(F.sum("a").cast("long").alias("s"))
        .select(
            "event_type",
            F.col("n_t").alias("n_events"),
            (
                F.col("s").cast("double")
                / (
                    F.col("n_t").cast("double")
                    * F.col("n_tot").cast("double")
                    * F.lit(100.0)
                )
            ).alias("w1"),
        )
        .orderBy("event_type")
    )


EVENTS_WASSERSTEIN_SQL = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
cells AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_all FROM ev GROUP BY c),
types AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ev
  GROUP BY event_type
),
per_tc AS (
  SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS n_tc FROM ev
  GROUP BY event_type, c
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM ev),
grid AS (
  SELECT t.event_type, t.n_t, ce.c, ce.n_all,
         CAST(COALESCE(p.n_tc, 0) AS BIGINT) AS n_tc
  FROM types t CROSS JOIN cells ce
  LEFT JOIN per_tc p ON p.event_type = t.event_type AND p.c = ce.c
),
cum AS (
  SELECT event_type, n_t,
         CAST(SUM(n_tc) OVER (PARTITION BY event_type ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_t,
         CAST(SUM(n_all) OVER (PARTITION BY event_type ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_all,
         CAST(LEAD(c) OVER (PARTITION BY event_type ORDER BY c) - c
              AS BIGINT) AS gap
  FROM grid
)
SELECT event_type, n_t AS n_events,
       CAST(SUM(ABS(cum_t * n_tot - cum_all * n_t) * gap) AS DOUBLE)
         / (CAST(n_t AS DOUBLE) * CAST(n_tot AS DOUBLE) * 100.0) AS w1
FROM cum, tot
WHERE gap IS NOT NULL
GROUP BY event_type, n_t, n_tot
ORDER BY event_type
"""


# ------------------------------------------- energy-distance two-sample


def events_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENERGY DISTANCE between the weekday and weekend daily-count
    distributions per event type — the two-sample test that is zero iff
    the distributions match, with no binning choice: E = 2*E|X-Y| -
    E|X-X'| - E|Y-Y'| (V-statistic form, all ordered pairs including
    i=j, so the within-terms carry zero diagonals on both engines
    identically).

    Exactness: daily counts are int64 on the calendar grid; every
    |x-y| pair sum is an exact int64 (day-pair frames are
    CALENDAR-bounded, the kendall-tau cost argument: ~n_days^2 tiny
    rows per type, never data-sized); the three means divide as
    CAST(s)/( CAST(na)*CAST(nb) ) in a fixed order and compose
    2*ab - aa - bb identically. Scale: the only data-sized stage is
    the (type, day) count agg behind the shared daily grid."""
    from .round7 import _daily_grid

    g = _daily_grid(spark, sf_dir).select(
        "t",
        "n",
        F.dayofweek("d").isin(1, 7).cast("int").alias("we"),  # Sun=1, Sat=7
    )
    a = g.where(F.col("we") == 0).select(F.col("t"), F.col("n").alias("x"))
    b = g.where(F.col("we") == 1).select(F.col("t"), F.col("n").alias("y"))

    def _pair_sum(l: DataFrame, r: DataFrame, lc: str, rc: str, out: str):
        return (
            l.join(r, "t")
            .groupBy("t")
            .agg(F.sum(F.abs(F.col(lc) - F.col(rc))).cast("long").alias(out))
        )

    ab = _pair_sum(a, b.select("t", "y"), "x", "y", "sab")
    aa = _pair_sum(a, a.select("t", F.col("x").alias("x2")), "x", "x2", "saa")
    bb = _pair_sum(b, b.select("t", F.col("y").alias("y2")), "y", "y2", "sbb")
    na = a.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("na"))
    nb = b.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("nb"))
    j = na.join(nb, "t").join(ab, "t").join(aa, "t").join(bb, "t")
    mab = F.col("sab").cast("double") / (
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    maa = F.col("saa").cast("double") / (
        F.col("na").cast("double") * F.col("na").cast("double")
    )
    mbb = F.col("sbb").cast("double") / (
        F.col("nb").cast("double") * F.col("nb").cast("double")
    )
    return j.select(
        F.col("t").alias("event_type"),
        F.col("na").alias("n_weekday_days"),
        F.col("nb").alias("n_weekend_days"),
        (F.lit(2.0) * mab - maa - mbb).alias("e_dist"),
    ).orderBy("event_type")


def _events_energy_distance_sql() -> str:
    from .round7 import _DAILY_GRID_SQL

    return f"""
WITH {_DAILY_GRID_SQL.lstrip()},
lab AS (
  SELECT t, n,
         CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS we
  FROM grid
),
a AS (SELECT t, n AS x FROM lab WHERE we = 0),
b AS (SELECT t, n AS y FROM lab WHERE we = 1),
ab AS (
  SELECT a.t, CAST(SUM(ABS(a.x - b.y)) AS BIGINT) AS sab
  FROM a JOIN b ON a.t = b.t GROUP BY a.t
),
aa AS (
  SELECT l.t, CAST(SUM(ABS(l.x - r.x)) AS BIGINT) AS saa
  FROM a l JOIN a r ON l.t = r.t GROUP BY l.t
),
bb AS (
  SELECT l.t, CAST(SUM(ABS(l.y - r.y)) AS BIGINT) AS sbb
  FROM b l JOIN b r ON l.t = r.t GROUP BY l.t
),
na AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS na FROM a GROUP BY t),
nb AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS nb FROM b GROUP BY t)
SELECT na.t AS event_type, na.na AS n_weekday_days, nb.nb AS n_weekend_days,
       2.0 * (CAST(sab AS DOUBLE) / (CAST(na.na AS DOUBLE)
                                     * CAST(nb.nb AS DOUBLE)))
         - (CAST(saa AS DOUBLE) / (CAST(na.na AS DOUBLE)
                                   * CAST(na.na AS DOUBLE)))
         - (CAST(sbb AS DOUBLE) / (CAST(nb.nb AS DOUBLE)
                                   * CAST(nb.nb AS DOUBLE))) AS e_dist
FROM na JOIN nb ON nb.t = na.t
JOIN ab ON ab.t = na.t JOIN aa ON aa.t = na.t JOIN bb ON bb.t = na.t
ORDER BY event_type
"""


# --------------------------------------------- Durbin-Watson residuals


def events_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DURBIN-WATSON autocorrelation of the residuals after the OLS
    day-index detrend of each type's daily counts — the diagnostic
    that says whether events_trend_ols's fit can be believed (DW ~ 2:
    independent residuals; DW -> 0: positive autocorrelation, the
    trend line is underfitting structure).

    Exactness: (n, Sx, Sy, Sxy, Sxx) are exact int64 over the day
    index; beta and alpha divide integer combinations once in a fixed
    order; each residual e_i = y_i - alpha - beta*i is the SAME double
    expression on both engines, and both the numerator
    sum((e_i - e_{i-1})^2) and denominator sum(e_i^2) are ORDERED
    folds (Spark aggregate / DuckDB list_reduce over the day-sorted
    list, the ewma recipe) — bit-identical, not merely close. Scale:
    one data-sized (type, day) agg; every fold runs over the
    calendar-bounded day list."""
    from .round7 import _daily_grid

    g = _daily_grid(spark, sf_dir)
    wd = Window.partitionBy("t").orderBy("d")
    idx = g.select(
        "t",
        F.col("n").cast("long").alias("y"),
        F.row_number().over(wd).cast("long").alias("i"),
    )
    st = idx.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("i").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("i") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "y"))),
            lambda p: p["y"],
        ).alias("ys"),
    )
    beta = (
        F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double") / (
        F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    co = st.where(F.col("n_days") >= 3).select(
        "t",
        "n_days",
        "ys",
        beta.alias("beta"),
        (
            (F.col("sy").cast("double") - beta * F.col("sx").cast("double"))
            / F.col("n_days").cast("double")
        ).alias("alpha"),
    )
    el = co.select(
        "t",
        "n_days",
        "beta",
        F.transform(
            F.sequence(F.lit(1), F.col("n_days").cast("int")),
            lambda i: F.element_at(F.col("ys"), i).cast("double")
            - F.col("alpha")
            - F.col("beta") * i.cast("double"),
        ).alias("e"),
    )
    den = F.aggregate(
        F.col("e"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    num = F.aggregate(
        F.transform(
            F.sequence(F.lit(2), F.col("n_days").cast("int")),
            lambda i: (
                F.element_at(F.col("e"), i)
                - F.element_at(F.col("e"), i - F.lit(1))
            )
            * (
                F.element_at(F.col("e"), i)
                - F.element_at(F.col("e"), i - F.lit(1))
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dw = num / den
    return el.select(
        F.col("t").alias("event_type"),
        "n_days",
        F.col("beta").alias("trend_slope"),
        dw.alias("dw"),
        (F.lit(1.0) - dw / F.lit(2.0)).alias("rho_approx"),
    ).orderBy("event_type")


def _events_durbin_watson_sql() -> str:
    from .round7 import _DAILY_GRID_SQL

    return f"""
WITH {_DAILY_GRID_SQL.lstrip()},
idx AS (
  SELECT t, CAST(n AS BIGINT) AS y,
         CAST(ROW_NUMBER() OVER (PARTITION BY t ORDER BY d) AS BIGINT) AS i
  FROM grid
),
st AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(i) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(i * y) AS BIGINT) AS sxy,
         CAST(SUM(i * i) AS BIGINT) AS sxx,
         list(y ORDER BY i) AS ys
  FROM idx GROUP BY t
),
co AS (
  SELECT t, n_days, ys,
         CAST(n_days * sxy - sx * sy AS DOUBLE)
           / CAST(n_days * sxx - sx * sx AS DOUBLE) AS beta,
         (CAST(sy AS DOUBLE)
            - (CAST(n_days * sxy - sx * sy AS DOUBLE)
               / CAST(n_days * sxx - sx * sx AS DOUBLE))
              * CAST(sx AS DOUBLE))
           / CAST(n_days AS DOUBLE) AS alpha
  FROM st WHERE n_days >= 3
),
el AS (
  SELECT t, n_days, beta,
         list_transform(generate_series(1, CAST(n_days AS INTEGER)),
           i -> CAST(ys[i] AS DOUBLE) - alpha - beta * CAST(i AS DOUBLE))
           AS e
  FROM co
)
SELECT t AS event_type, n_days, beta AS trend_slope,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(generate_series(2, CAST(n_days AS INTEGER)),
           i -> (e[i] - e[i - 1]) * (e[i] - e[i - 1]))),
         (acc, x) -> acc + x)
       / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(e, x -> x * x)), (acc, x) -> acc + x) AS dw,
       1.0 - (list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(generate_series(2, CAST(n_days AS INTEGER)),
           i -> (e[i] - e[i - 1]) * (e[i] - e[i - 1]))),
         (acc, x) -> acc + x)
       / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(e, x -> x * x)), (acc, x) -> acc + x)) / 2.0
         AS rho_approx
FROM el
ORDER BY event_type
"""


# ---------------------------------------------- turning-points test


def events_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TURNING-POINTS randomness test on each type's daily-count
    series: count strict local maxima/minima (sign flip between the
    two adjacent first differences); under i.i.d. randomness
    E[T] = 2(n-2)/3 and Var[T] = (16n-29)/90, so the z-score screens
    'is this series noise or structure' before any trend machinery.

    Exactness: differences, signs and the turning-point count are pure
    int64 (flat steps carry sign 0 and never count — same rule both
    engines); the expected value, variance and z compose doubles in
    one fixed expression with a single correctly-rounded sqrt. Scale:
    the lag/lead windows run per type over the calendar-bounded day
    grid; the one data-sized stage is the shared daily agg."""
    from .round7 import _daily_grid

    g = _daily_grid(spark, sf_dir)
    wd = Window.partitionBy("t").orderBy("d")
    sgn = lambda c: F.when(c > 0, 1).when(c < 0, -1).otherwise(0)  # noqa: E731
    d = g.select(
        "t",
        sgn(F.col("n") - F.lag("n").over(wd)).alias("s1"),
        sgn(F.lead("n").over(wd) - F.col("n")).alias("s2"),
    )
    per = d.groupBy("t").agg(
        (F.count(F.lit(1))).cast("long").alias("n_days"),
        F.sum(
            F.when(F.col("s1") * F.col("s2") == -1, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_turning"),
    )
    nd = F.col("n_days").cast("double")
    expected = F.lit(2.0) * (nd - F.lit(2.0)) / F.lit(3.0)
    variance = (F.lit(16.0) * nd - F.lit(29.0)) / F.lit(90.0)
    return (
        per.where(F.col("n_days") >= 3)
        .select(
            F.col("t").alias("event_type"),
            "n_days",
            "n_turning",
            expected.alias("expected"),
            (
                (F.col("n_turning").cast("double") - expected)
                / F.sqrt(variance)
            ).alias("z"),
        )
        .orderBy("event_type")
    )


def _events_turning_points_sql() -> str:
    from .round7 import _DAILY_GRID_SQL

    return f"""
WITH {_DAILY_GRID_SQL.lstrip()},
d AS (
  SELECT t,
         CASE WHEN n - LAG(n) OVER w > 0 THEN 1
              WHEN n - LAG(n) OVER w < 0 THEN -1 ELSE 0 END AS s1,
         CASE WHEN LEAD(n) OVER w - n > 0 THEN 1
              WHEN LEAD(n) OVER w - n < 0 THEN -1 ELSE 0 END AS s2
  FROM grid
  WINDOW w AS (PARTITION BY t ORDER BY d)
),
per AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(CASE WHEN s1 * s2 = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_turning
  FROM d GROUP BY t
)
SELECT t AS event_type, n_days, n_turning,
       2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0 AS expected,
       (CAST(n_turning AS DOUBLE)
          - 2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0)
         / sqrt((16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0) AS z
FROM per WHERE n_days >= 3
ORDER BY event_type
"""


# ------------------------------------------- duplicate-invoice screen


def dq_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATE-INVOICE screen: pairs of orders by the SAME customer
    on the SAME day — the classic warehouse fraud/data-entry audit
    (split invoices, double-submits). Emits the first 100 pairs with
    the amount delta so an analyst can eyeball true dupes (delta ~ 0)
    vs legitimate same-day repeat buys.

    Exactness: the join key and pair ordering are integers/dates; the
    amount delta is |cents_1 - cents_2| int64 with one /100.0. Scale:
    equi-join on (custkey, order day) — fan-out is quadratic only
    WITHIN a customer-day cell, which business reality bounds to a
    handful; the join itself is a keyed shuffle, never a cartesian."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("order_day"),
        F.col("o_orderkey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    a = o.select(
        "o_custkey",
        "order_day",
        F.col("o_orderkey").alias("k1"),
        F.col("cents").alias("c1"),
    )
    b = o.select(
        "o_custkey",
        "order_day",
        F.col("o_orderkey").alias("k2"),
        F.col("cents").alias("c2"),
    )
    return (
        a.join(b, ["o_custkey", "order_day"])
        .where(F.col("k1") < F.col("k2"))
        .select(
            "o_custkey",
            "order_day",
            "k1",
            "k2",
            (
                F.abs(F.col("c1") - F.col("c2")).cast("double")
                / F.lit(100.0)
            ).alias("amount_delta"),
        )
        .orderBy("o_custkey", "k1", "k2")
        .limit(100)
    )


DQ_DUPLICATE_ORDERS_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day, o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT a.o_custkey, a.order_day, a.o_orderkey AS k1, b.o_orderkey AS k2,
       CAST(ABS(a.cents - b.cents) AS DOUBLE) / 100.0 AS amount_delta
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.order_day = b.order_day
WHERE a.o_orderkey < b.o_orderkey
ORDER BY a.o_custkey, k1, k2
LIMIT 100
"""


# ------------------------------------------ unit-price plausibility


def dq_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIT-PRICE PLAUSIBILITY audit per brand: flag lineitems whose
    implied unit price strays outside [5%, 2000%] of the catalog
    retail price — the cross-field consistency rule that catches
    decimal-shift and wrong-part data-entry errors (demo band chosen
    to flag the observed ~5% tails).

    Exactness: the band test is PURE int64 — ep_cents*100 vs
    5*qty*rp_cents and 2000*qty*rp_cents (quantities are integral;
    floor(q+0.5) pins them) — and the reported max ratio divides the
    same two int64s once (selection over identically-computed doubles).
    Scale: lineitem joins the part dim on partkey (broadcastable dim),
    then one brand-keyed agg; no data-sized window anywhere."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("ep"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("rp"),
    )
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "p_brand",
        (F.col("ep") * 100).alias("lhs"),
        (F.col("qty") * F.col("rp")).alias("base"),
        (
            F.col("ep").cast("double")
            / (F.col("qty") * F.col("rp")).cast("double")
        ).alias("ratio"),
    )
    viol = (F.col("lhs") < 5 * F.col("base")) | (
        F.col("lhs") > 2000 * F.col("base")
    )
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(viol, 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
            F.max("ratio").alias("max_unit_ratio"),
        )
        .select(
            "p_brand",
            "n_lines",
            "n_violations",
            (
                F.col("n_violations").cast("double")
                / F.col("n_lines").cast("double")
            ).alias("violation_rate"),
            "max_unit_ratio",
        )
        .orderBy("p_brand")
    )


DQ_PRICE_CONSISTENCY_SQL = """
WITH j AS (
  SELECT p.p_brand,
         CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) * 100 AS lhs,
         CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT)
           * CAST(FLOOR(p.p_retailprice * 100 + 0.5) AS BIGINT) AS base,
         CAST(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
              AS DOUBLE)
           / CAST(CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT)
                  * CAST(FLOOR(p.p_retailprice * 100 + 0.5) AS BIGINT)
                  AS DOUBLE) AS ratio
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN lhs < 5 * base OR lhs > 2000 * base
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(SUM(CASE WHEN lhs < 5 * base OR lhs > 2000 * base
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS violation_rate,
       MAX(ratio) AS max_unit_ratio
FROM j
GROUP BY p_brand
ORDER BY p_brand
"""


# ------------------------------------------- PQ distortion audit


def simsearch_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ RECONSTRUCTION-DISTORTION audit per subspace: the mean
    squared quantization error between each vector's subvector and its
    nearest trained code — the index-health number you read BEFORE
    trusting ivfpq's ADC ranking (a hot subspace with 10x the
    distortion of its peers is where recall dies first).

    Trains the same integer-exact PQ codebooks as ivfpq_topk_exact
    (pq_train_exact_int: deterministic seeding, 4 integer-Lloyd rounds
    on the 2^-20 unit grid) and measures min-over-codes squared int64
    distance in ONE narrow mapInPandas pass that emits per-batch
    (subspace, n, sum) partials — the map-side-combine shape, nothing
    data-sized shuffles. The oracle re-trains through the shared
    _pq_train_ctes and re-measures via MIN over the code axis.
    Exactness: distances and sums are int64 (bounded by
    n_vectors * sub * (2^21)^2 — inside int64 through sf10 for the
    observed near-codebook distances); msq divides twice in a fixed
    order (by n, then by 2^40)."""
    import numpy as np
    import pandas as pd

    from ..operators.simsearch import _unit_q_int, pq_train_exact_int
    from .pipeline_ops import _embs

    m, n_codes, iters, sample = 32, 64, 4, 2048
    embs = _embs(spark, sf_dir)
    B = pq_train_exact_int(
        embs, m=m, n_codes=n_codes, iters=iters, sample=sample,
        cache_key=sf_dir,
    )
    sub = B.shape[2]
    bc = spark.sparkContext.broadcast(B)

    def distort(batches):
        Bl = bc.value
        ml = Bl.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["emb"].to_numpy())
            U = _unit_q_int(X)
            sums = np.empty(ml, dtype=np.int64)
            for j in range(ml):
                Uj = U[:, j * sub : (j + 1) * sub]
                d = ((Uj[:, None, :] - Bl[j][None, :, :]) ** 2).sum(axis=2)
                sums[j] = d.min(axis=1).sum()
            yield pd.DataFrame(
                {
                    "subspace": np.arange(ml, dtype=np.int64),
                    "n": np.full(ml, len(U), dtype=np.int64),
                    "s": sums,
                }
            )

    e = embs.select(F.col("embedding").cast("array<double>").alias("emb"))
    parts = e.mapInPandas(distort, "subspace long, n long, s long")
    return (
        parts.groupBy("subspace")
        .agg(
            F.sum("n").cast("long").alias("n_vectors"),
            F.sum("s").cast("long").alias("sum_d2"),
        )
        .select(
            "subspace",
            "n_vectors",
            "sum_d2",
            (
                (
                    F.col("sum_d2").cast("double")
                    / F.col("n_vectors").cast("double")
                )
                / F.lit(_Q40)
            ).alias("msq"),
        )
        .orderBy("subspace")
    )


def _simsearch_pq_distortion_sql() -> str:
    from ..operators.simsearch import DIM, _pq_train_ctes

    m, n_codes, iters, sample = 32, 64, 4, 2048
    sub = DIM // m
    return f"""
WITH {_pq_train_ctes(m, n_codes, iters, sample, DIM)},
dist AS (
  SELECT q.vec_id, b.j,
         CAST(MIN(list_sum(list_transform(generate_series(1, {sub}),
             i -> (q.u[b.j * {sub} + i] - b.b[i])
                * (q.u[b.j * {sub} + i] - b.b[i])))) AS BIGINT) AS d2
  FROM uq q CROSS JOIN b{iters} b
  GROUP BY q.vec_id, b.j
)
SELECT j AS subspace, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(d2) AS BIGINT) AS sum_d2,
       (CAST(SUM(d2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
         / {_Q40!r} AS msq
FROM dist
GROUP BY j
ORDER BY subspace
"""


# ------------------------------------------- streaming EWMA alert


def stream_ewma_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained EWMA deviation alert: the per-(type,
    day) mean-value aggregate runs as a COMPLETE-mode streaming query
    (state = one row per type-day cell, updated as events arrive — the
    live-baseline capability next to stream_topk_cells), and the alert
    layer reads the finished snapshot: a day alerts when its mean
    exceeds 1.25x the EWMA (alpha = 1/8, initialized at the first
    day's mean) of all PRIOR days.

    Exactness: daily means use the decimal-staged _davg; the EWMA
    prefix folds are ORDERED (aggregate / list_reduce, the ewma
    recipe) with binary-exact literals 0.875/0.125/1.25, and the
    per-day prefix re-fold is O(days^2) on the CALENDAR-bounded day
    list (the isotonic bounded-domain contract). Run to completion the
    snapshot equals the batch daily agg, so the batch twin is the
    oracle. Scale: streaming state is |types| x |days| rows; the fold
    never sees event-sized data."""
    from .harness import (
        _events_stream,
        _run_to_completion,
        _stream_state_partitions,
    )
    from .relational import _davg

    e = _events_stream(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(_davg(F.col("value")).alias("mu"))
    snap = _run_to_completion(
        daily, spark, _stream_state_partitions(sf_dir), output_mode="complete"
    )

    st = snap.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "mu"))),
            lambda p: p["mu"],
        ).alias("mus"),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr,
        F.element_at(F.col("mus"), 1),
        lambda acc, x: acc * F.lit(0.875) + x * F.lit(0.125),
    )
    ewma = fold(F.slice(F.col("mus"), 2, (F.col("n_days") - 1).cast("int")))
    n_alerts = F.when(
        F.col("n_days") >= 2,
        F.aggregate(
            F.transform(
                F.sequence(F.lit(2), F.col("n_days").cast("int")),
                lambda i: F.when(
                    F.element_at(F.col("mus"), i)
                    > F.lit(1.25)
                    * F.aggregate(
                        F.slice(F.col("mus"), 2, i - F.lit(2)),
                        F.element_at(F.col("mus"), 1),
                        lambda acc, x: acc * F.lit(0.875)
                        + x * F.lit(0.125),
                    ),
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    ).otherwise(F.lit(0).cast("long"))
    return st.select(
        "event_type",
        "n_days",
        ewma.alias("baseline"),
        n_alerts.alias("n_alerts"),
    ).orderBy("event_type")


STREAM_EWMA_ALERT_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
           / COUNT(value) AS mu
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         list(mu ORDER BY day) AS mus
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days,
       list_reduce(
         list_prepend(mus[1],
           list_slice(mus, 2, CAST(n_days AS INTEGER))),
         (acc, x) -> acc * 0.875 + x * 0.125) AS baseline,
       CASE WHEN n_days >= 2 THEN
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(2, CAST(n_days AS INTEGER)),
             i -> CASE WHEN mus[i] > 1.25 * list_reduce(
                    list_prepend(mus[1], list_slice(mus, 2, i - 1)),
                    (acc, x) -> acc * 0.875 + x * 0.125)
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
           (acc, x) -> acc + x)
       ELSE CAST(0 AS BIGINT) END AS n_alerts
FROM st
ORDER BY event_type
"""


# ------------------------------------------- term burstiness (VMR)


def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale TERM BURSTINESS for the top-20 document-frequency
    terms: the variance-to-mean ratio of per-document counts
    (including zero-count documents). VMR ~ 1 is Poisson scatter
    (function words); VMR >> 1 is bursty topical vocabulary — the
    signal behind stopword lists and tf saturation in BM25.

    Exactness: per-(term, doc) counts, document frequency, sum and
    sum-of-squares are exact int64 from one token-explode pass; VMR
    composes mean = s/N and E[x^2] = q/N in a fixed order (population
    variance over ALL N docs, zeros included, contributing 0 to both
    sums). Top-20 selection is an integer sort (df desc, term asc) on
    the vocab-bounded term frame. Scale: one data-sized explode + two
    map-side-combinable hash aggs; the window runs on vocab-bounded
    rows."""
    from ..operators.text import token_arrays

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    toks = token_arrays(d, cache_key=sf_dir).select(
        "doc_id", F.explode("toks").alias("term")
    )
    per_td = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_t = per_td.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    top = (
        per_t.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .drop("rn")
    )
    nd = F.col("n_docs").cast("double")
    mean = F.col("s").cast("double") / nd
    ex2 = F.col("q").cast("double") / nd
    return (
        top.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            F.col("s").alias("total_count"),
            mean.alias("mean_per_doc"),
            ((ex2 - mean * mean) / mean).alias("vmr"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
    )


def _text_burstiness_sql() -> str:
    from ..operators.text import TOKEN_RE

    return f"""
WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '{TOKEN_RE}'))
           AS term
  FROM documents
),
per_td AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY term, doc_id
),
per_t AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS q
  FROM per_td GROUP BY term
),
top AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rn
    FROM per_t
  ) WHERE rn <= 20
)
SELECT term, df, s AS total_count,
       CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_per_doc,
       (CAST(q AS DOUBLE) / CAST(n_docs AS DOUBLE)
          - (CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE))
            * (CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE)))
         / (CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS vmr
FROM top, nd
ORDER BY df DESC, term ASC
"""


# ---------------------------------------------- Friedman rank test


def events_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRIEDMAN repeated-measures rank test: within each calendar WEEK
    BLOCK, rank the k event types by weekly volume; do the types keep
    the same ordering week after week (large chi2) or shuffle randomly
    (small)? The blocked twin of Kruskal-Wallis — week blocks absorb
    global traffic drift that would contaminate the unblocked test.

    Exactness: week blocks are integer day-offsets DIV 7 from the
    global min day (engine week-of-year rules differ — never used);
    DOUBLED midranks d = 2*cum - cnt + 1 are exact integers per block;
    rank sums D_j and the tie term sum(cnt^3 - cnt) are int64; the
    statistic composes 3*sum(D_j^2)/(n*k*(k+1)) - 3*n*(k+1) in one
    fixed float expression (sum(D_j^2) is an integer hash agg —
    order-free). Scale: one data-sized (type, week) agg; ranking
    windows run per block over k rows."""
    from .round7 import _daily_grid

    g = _daily_grid(spark, sf_dir)
    mind = g.agg(F.min("d").alias("d0"))
    yw = (
        g.crossJoin(F.broadcast(mind))
        .select(
            "t",
            # integer division explicitly (DuckDB's BIGINT cast of a
            # float division ROUNDS; Spark's truncates — DIV on both)
            F.expr("CAST(datediff(d, d0) DIV 7 AS BIGINT)").alias("w"),
            "n",
        )
        .groupBy("t", "w")
        .agg(F.sum("n").cast("long").alias("v"))
    )
    per_wv = yw.groupBy("w", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("w")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = per_wv.withColumn(
        "d", (2 * F.sum("cnt").over(wcum) - F.col("cnt") + 1).cast("long")
    )
    dtw = yw.join(ranked.select("w", "v", "d"), ["w", "v"])
    per_type = dtw.groupBy("t").agg(
        F.sum("d").cast("long").alias("dj"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    stats = per_type.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n_blocks").cast("long").alias("n"),
        F.sum(F.col("dj") * F.col("dj")).cast("long").alias("sd2"),
    )
    ties = per_wv.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("long")
        .alias("tt")
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    chi2 = F.lit(3.0) * F.col("sd2").cast("double") / (
        nd * kd * (kd + F.lit(1.0))
    ) - F.lit(3.0) * nd * (kd + F.lit(1.0))
    corr = F.lit(1.0) - F.col("tt").cast("double") / (
        nd * kd * (kd * kd - F.lit(1.0))
    )
    return stats.crossJoin(F.broadcast(ties)).select(
        F.col("n").alias("n_blocks"),
        "k",
        chi2.alias("friedman_chi2"),
        (chi2 / corr).alias("chi2_tie_corrected"),
    )


def _events_friedman_sql() -> str:
    from .round7 import _DAILY_GRID_SQL

    return f"""
WITH {_DAILY_GRID_SQL.lstrip()},
mind AS (SELECT MIN(d) AS d0 FROM grid),
yw AS (
  SELECT t, CAST(DATEDIFF('day', d0, d) // 7 AS BIGINT) AS w,
         CAST(SUM(n) AS BIGINT) AS v
  FROM grid, mind GROUP BY t, CAST(DATEDIFF('day', d0, d) // 7 AS BIGINT)
),
per_wv AS (
  SELECT w, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM yw GROUP BY w, v
),
ranked AS (
  SELECT w, v,
         CAST(2 * SUM(cnt) OVER (PARTITION BY w ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - cnt + 1 AS BIGINT) AS d
  FROM per_wv
),
per_type AS (
  SELECT yw.t, CAST(SUM(r.d) AS BIGINT) AS dj,
         CAST(COUNT(*) AS BIGINT) AS n_blocks
  FROM yw JOIN ranked r ON r.w = yw.w AND r.v = yw.v
  GROUP BY yw.t
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(n_blocks) AS BIGINT) AS n,
         CAST(SUM(dj * dj) AS BIGINT) AS sd2
  FROM per_type
),
ties AS (
  SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tt FROM per_wv
)
SELECT n AS n_blocks, k,
       3.0 * CAST(sd2 AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
            * (CAST(k AS DOUBLE) + 1.0))
         - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
         AS friedman_chi2,
       (3.0 * CAST(sd2 AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
             * (CAST(k AS DOUBLE) + 1.0))
          - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
         / (1.0 - CAST(tt AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
               * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)))
         AS chi2_tie_corrected
FROM stats, ties
"""


# ------------------------------------------ classical seasonal index


def sql_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSICAL SEASONAL INDEX of monthly order revenue: the
    ratio-to-centered-moving-average decomposition (the 2x12 MA that
    predates STL) — per calendar month, the mean ratio of actual
    revenue to its 13-month centered average, then normalized so the
    twelve indices average 1. The planning number behind 'August ships
    7% light'.

    Exactness: monthly revenue is exact integer cents (zero-filled
    over the continuous month range); each 2x12 MA denominator
    N_i = c[i-6] + c[i+6] + 2*sum(c[i-5..i+5]) is an int64 fold; each
    ratio divides 24*c_i by N_i once; the per-month mean and the
    normalization are ORDERED folds over month-index-sorted doubles
    (the ewma recipe). Scale: ONE data-sized monthly agg; everything
    after runs on the CALENDAR-bounded month array (80 entries at
    every sf — the bounded-domain contract)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "mi"
        )
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("cents")
    )
    bounds = monthly.agg(
        F.min("mi").alias("mi0"), F.max("mi").alias("mi1")
    )
    months = bounds.select(
        "mi0",
        F.explode(F.sequence(F.col("mi0"), F.col("mi1"))).alias("mi"),
    )
    filled = months.join(monthly, "mi", "left").select(
        "mi0",
        "mi",
        F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("cents"),
    )
    series = filled.groupBy("mi0").agg(
        F.count(F.lit(1)).cast("long").alias("nm"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("mi", "cents"))),
            lambda p: p["cents"],
        ).alias("ys"),
    )
    el = lambda i: F.element_at(F.col("ys"), i)  # noqa: E731
    inner = lambda i: F.aggregate(  # 2*sum of the 11 middles   # noqa: E731
        F.transform(
            F.sequence(i - F.lit(5), i + F.lit(5)), lambda j: el(j)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ratios = series.where(F.col("nm") >= 13).select(
        "mi0",
        "nm",
        F.filter(
            F.transform(
                F.sequence(F.lit(7), (F.col("nm") - 6).cast("int")),
                lambda i: F.struct(
                    (
                        (
                            (F.col("mi0") + i.cast("long") - 1) % 12
                        )
                        + 1
                    ).alias("moy"),
                    i.cast("long").alias("i"),
                    F.when(
                        el(i - F.lit(6))
                        + el(i + F.lit(6))
                        + 2 * inner(i)
                        > 0,
                        (el(i) * 24).cast("double")
                        / (
                            el(i - F.lit(6))
                            + el(i + F.lit(6))
                            + 2 * inner(i)
                        ).cast("double"),
                    ).alias("r"),
                ),
            ),
            lambda s: s["r"].isNotNull(),
        ).alias("rs"),
    )
    per_moy = (
        ratios.select(F.explode("rs").alias("s"))
        .select(
            F.col("s.moy").alias("month_of_year"),
            F.col("s.i").alias("i"),
            F.col("s.r").alias("r"),
        )
        .groupBy("month_of_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ratios"),
            (
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "r"))),
                        lambda p: p["r"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("index_raw"),
        )
    )
    norm = per_moy.agg(
        F.count(F.lit(1)).cast("long").alias("n_moy"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("month_of_year", "index_raw"))
                ),
                lambda p: p["index_raw"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s_raw"),
    )
    return (
        per_moy.crossJoin(F.broadcast(norm))
        .select(
            "month_of_year",
            "n_ratios",
            "index_raw",
            (
                F.col("index_raw")
                * F.col("n_moy").cast("double")
                / F.col("s_raw")
            ).alias("index_norm"),
        )
        .orderBy("month_of_year")
    )


SQL_SEASONAL_INDEX_SQL = """
WITH monthly AS (
  SELECT CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT)
           AS mi,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
bounds AS (SELECT MIN(mi) AS mi0, MAX(mi) AS mi1 FROM monthly),
months AS (
  SELECT b.mi0, UNNEST(generate_series(b.mi0, b.mi1)) AS mi FROM bounds b
),
filled AS (
  SELECT m.mi0, m.mi, CAST(COALESCE(mo.cents, 0) AS BIGINT) AS cents
  FROM months m LEFT JOIN monthly mo ON mo.mi = m.mi
),
series AS (
  SELECT mi0, CAST(COUNT(*) AS BIGINT) AS nm,
         list(cents ORDER BY mi) AS ys
  FROM filled GROUP BY mi0
),
rat AS (
  SELECT u.s.moy AS month_of_year, u.s.i AS i, u.s.r AS r
  FROM (
    SELECT UNNEST(list_filter(
      list_transform(generate_series(7, CAST(nm AS INTEGER) - 6),
        i -> struct_pack(
          moy := ((mi0 + i - 1) % 12) + 1,
          i := CAST(i AS BIGINT),
          r := CASE WHEN ys[i - 6] + ys[i + 6]
                         + 2 * list_reduce(list_prepend(
                             CAST(0 AS BIGINT),
                             list_transform(generate_series(i - 5, i + 5),
                               j -> ys[j])),
                             (acc, x) -> acc + x) > 0
               THEN CAST(ys[i] * 24 AS DOUBLE)
                    / CAST(ys[i - 6] + ys[i + 6]
                           + 2 * list_reduce(list_prepend(
                               CAST(0 AS BIGINT),
                               list_transform(
                                 generate_series(i - 5, i + 5),
                                 j -> ys[j])),
                               (acc, x) -> acc + x) AS DOUBLE)
               END)),
      s -> s.r IS NOT NULL)) AS s
    FROM series WHERE nm >= 13
  ) u
),
per_moy AS (
  SELECT month_of_year, CAST(COUNT(*) AS BIGINT) AS n_ratios,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(r ORDER BY i)), (acc, x) -> acc + x)
           / CAST(COUNT(*) AS DOUBLE) AS index_raw
  FROM rat GROUP BY month_of_year
),
norm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_moy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(index_raw ORDER BY month_of_year)),
           (acc, x) -> acc + x) AS s_raw
  FROM per_moy
)
SELECT month_of_year, n_ratios, index_raw,
       index_raw * CAST(n_moy AS DOUBLE) / s_raw AS index_norm
FROM per_moy, norm
ORDER BY month_of_year
"""


# ------------------------------------- edge-Jaccard sparsification


def sql_copurchase_edge_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NEIGHBORHOOD-JACCARD histogram of the co-purchase edges — the
    graph-sparsification audit (Satuluri-style local sparsification
    keeps each node's highest-Jaccard edges; this histogram is the
    read that picks the threshold). For edge (x, y):
    J = |N(x) ∩ N(y)| / |N(x) ∪ N(y)| with open neighborhoods (the
    union retains x and y themselves since y ∈ N(x), x ∈ N(y)).

    Exactness: common-neighbor counts come from the triangle-shaped
    two-hop join on the CACHED edge frame; degrees are int64; the
    histogram bin is INTEGER division (10*cn) DIV union — no float
    anywhere. Scale: per-edge fan-out is deg-bounded on the
    support-thresholded graph (the triangles argument); everything
    joins keyed, nothing cartesian."""
    from .relational import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir).select("x", "y")
    adj = e.union(
        e.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).select(F.col("x").alias("a"), F.col("y").alias("z"))
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ax = adj.select(F.col("a").alias("x"), "z")
    ay = adj.select(F.col("a").alias("y"), "z")
    cn = (
        e.join(ax, "x")
        .join(ay, ["y", "z"])
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    scored = (
        e.join(cn, ["x", "y"], "left")
        .join(deg.select(F.col("a").alias("x"), F.col("deg").alias("dx")), "x")
        .join(deg.select(F.col("a").alias("y"), F.col("deg").alias("dy")), "y")
        .select(
            F.coalesce(F.col("cn"), F.lit(0)).cast("long").alias("cn"),
            (F.col("dx") + F.col("dy")).alias("dsum"),
        )
        .select(
            F.expr("(10 * cn) DIV (dsum - cn)").cast("long").alias("jbin")
        )
    )
    return (
        scored.groupBy("jbin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .orderBy("jbin")
    )


def _sql_copurchase_edge_jaccard_sql() -> str:
    from .relational import _COPURCHASE_EDGES_CTE

    return f"""
{_COPURCHASE_EDGES_CTE},
adj AS MATERIALIZED (
  SELECT x AS a, y AS z FROM edges
  UNION ALL SELECT y AS a, x AS z FROM edges
),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY a),
cn AS (
  SELECT e.x, e.y, CAST(COUNT(*) AS BIGINT) AS cn
  FROM edges e
  JOIN adj ax ON ax.a = e.x
  JOIN adj ay ON ay.a = e.y AND ay.z = ax.z
  GROUP BY e.x, e.y
),
scored AS (
  SELECT CAST((10 * COALESCE(c.cn, 0))
              // (dx.deg + dy.deg - COALESCE(c.cn, 0)) AS BIGINT) AS jbin
  FROM edges e
  LEFT JOIN cn c ON c.x = e.x AND c.y = e.y
  JOIN deg dx ON dx.a = e.x
  JOIN deg dy ON dy.a = e.y
)
SELECT jbin, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM scored GROUP BY jbin ORDER BY jbin
"""


QUERIES = {
    "events_wasserstein": events_wasserstein,
    "events_energy_distance": events_energy_distance,
    "events_durbin_watson": events_durbin_watson,
    "events_turning_points": events_turning_points,
    "dq_duplicate_orders": dq_duplicate_orders,
    "dq_price_consistency": dq_price_consistency,
    "simsearch_pq_distortion": simsearch_pq_distortion,
    "stream_ewma_alert": stream_ewma_alert,
    "text_burstiness": text_burstiness,
    "events_friedman": events_friedman,
    "sql_seasonal_index": sql_seasonal_index,
    "sql_copurchase_edge_jaccard": sql_copurchase_edge_jaccard,
}

ORACLES = {
    "events_wasserstein": EVENTS_WASSERSTEIN_SQL,
    "events_energy_distance": _events_energy_distance_sql(),
    "events_durbin_watson": _events_durbin_watson_sql(),
    "events_turning_points": _events_turning_points_sql(),
    "dq_duplicate_orders": DQ_DUPLICATE_ORDERS_SQL,
    "dq_price_consistency": DQ_PRICE_CONSISTENCY_SQL,
    "simsearch_pq_distortion": _simsearch_pq_distortion_sql(),
    "stream_ewma_alert": STREAM_EWMA_ALERT_SQL,
    "text_burstiness": _text_burstiness_sql(),
    "events_friedman": _events_friedman_sql(),
    "sql_seasonal_index": SQL_SEASONAL_INDEX_SQL,
    "sql_copurchase_edge_jaccard": _sql_copurchase_edge_jaccard_sql(),
}
