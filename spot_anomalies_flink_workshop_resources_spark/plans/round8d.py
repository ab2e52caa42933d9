"""Round-8 fourth wave: blocked/ordered nonparametric tests, a
two-sample rate test, and distributional corpus profiling.

Completes the test battery around the existing screens: COCHRAN'S Q
generalizes events_mcnemar_activity to three paired periods ("did the
SAME users churn across weeks?"); JONCKHEERE-TERPSTRA upgrades
events_kruskal_wallis when the groups carry a natural ORDER (dayparts
— "does value rise through the day?"); SEASONAL MANN-KENDALL is the
trend test the plain MK gets wrong on weekly-periodic series (pairs
compare only like weekdays, Hirsch-Slack form); the POISSON RATE test
is the count-data companion to welch_t (daily event RATE, weekend vs
weekday, conditional binomial form); the LOGNORMAL length fit is the
document-length profile a curation rollout fits before setting Gopher
length gates; and HONORÉ'S R / SICHEL'S S complete text_yule_k's
frequency-spectrum constants.

Exactness follows the repo recipes: integer sufficient statistics,
epoch-day arithmetic (d % 7 seasons — engine week rules never
consulted), libm ln for transcendentals, per-term 2^-k quantization
before int64 folds, one final float composition per statistic. The
reference's scope ends at fixed-threshold detection (AD.java:200);
this layer is beyond-reference by design (SURVEY.md §2 extension
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_Q17 = 1 << 17
_Q20 = 1 << 20


# -------------------------------------------------------- Cochran's Q


def events_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN'S Q over the first THREE weeks of the span, per event
    type: did the same users' weekly activity flags change across k=3
    related periods (the k-sample McNemar)? Q = (k-1) * (k*sum G_j^2 -
    N^2) / (k*sum L_u - sum L_u^2) with G_j the week totals, L_u the
    per-user success counts, N the grand total — the cross-multiplied
    form keeps EVERYTHING int64 until one final division.

    Scale: one data-sized distinct to (type, user, week); both
    reductions are map-side-combinable hash aggs on user-dimension
    frames. Users with L_u = k (always active) or 0 contribute nothing
    to Q's numerator but stay in the denominator per the standard
    definition over the observed panel."""
    k = 3
    e = load_table(spark, sf_dir, "events")
    d0 = e.agg(F.min(F.to_date("ts")).alias("d0"))
    wk = (
        e.crossJoin(F.broadcast(d0))
        .select(
            "event_type",
            "user_id",
            F.floor(F.datediff(F.to_date("ts"), F.col("d0")) / 7)
            .cast("long")
            .alias("wk"),
        )
        .where((F.col("wk") >= 0) & (F.col("wk") < k))
        .distinct()
    )
    per_user = wk.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("l")
    )
    user_side = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("l").cast("long").alias("n_tot"),
        F.sum(F.col("l") * F.col("l")).cast("long").alias("l2"),
    )
    week_side = (
        wk.groupBy("event_type", "wk")
        .agg(F.count(F.lit(1)).cast("long").alias("g"))
        .groupBy("event_type")
        .agg(F.sum(F.col("g") * F.col("g")).cast("long").alias("g2"))
    )
    j = user_side.join(week_side, "event_type").where(
        F.lit(k) * F.col("n_tot") - F.col("l2") > 0
    )
    num = (F.lit(k - 1) * (
        F.lit(k) * F.col("g2") - F.col("n_tot") * F.col("n_tot")
    )).cast("double")
    den = (F.lit(k) * F.col("n_tot") - F.col("l2")).cast("double")
    return j.select(
        "event_type",
        "n_users",
        F.lit(k - 1).cast("long").alias("df"),
        (num / den).alias("cochran_q"),
    ).orderBy("event_type")


EVENTS_COCHRAN_Q_SQL = """
WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
wk AS (
  SELECT DISTINCT event_type, user_id,
         CAST(FLOOR(date_diff('day', d0.d0, CAST(ts AS DATE)) / 7)
              AS BIGINT) AS wk
  FROM events CROSS JOIN d0
  WHERE CAST(FLOOR(date_diff('day', d0.d0, CAST(ts AS DATE)) / 7)
             AS BIGINT) BETWEEN 0 AND 2
),
per_user AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS l
  FROM wk GROUP BY event_type, user_id
),
user_side AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(l) AS BIGINT) AS n_tot,
         CAST(SUM(l * l) AS BIGINT) AS l2
  FROM per_user GROUP BY event_type
),
week_side AS (
  SELECT event_type, CAST(SUM(g * g) AS BIGINT) AS g2 FROM (
    SELECT event_type, wk, CAST(COUNT(*) AS BIGINT) AS g
    FROM wk GROUP BY event_type, wk
  ) GROUP BY event_type
)
SELECT u.event_type, u.n_users, CAST(2 AS BIGINT) AS df,
       CAST(2 * (3 * w.g2 - u.n_tot * u.n_tot) AS DOUBLE)
         / CAST(3 * u.n_tot - u.l2 AS DOUBLE) AS cochran_q
FROM user_side u JOIN week_side w ON w.event_type = u.event_type
WHERE 3 * u.n_tot - u.l2 > 0
ORDER BY u.event_type
"""


# --------------------------------------------- Jonckheere-Terpstra


def events_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JONCKHEERE-TERPSTRA test for an ORDERED alternative across the
    four 6-hour dayparts, per event type — "does VALUE trend upward
    through the day?", strictly more powerful than Kruskal-Wallis when
    the hypothesis is monotone. J = sum over daypart pairs i<j of the
    Mann-Whitney count #{x_i < x_j} (+ half-ties).

    Exactness: all pair counts collapse onto the cents grid —
    per-daypart EXCLUSIVE running sums give the strictly-below mass,
    and the DOUBLED statistic 2J = sum n_j(c)*(2*below_i(c) + n_i(c))
    stays int64 throughout; the z-score composes the standard no-tie
    moments from exact group counts in one fixed float expression
    (documented approximation — ties on the cents grid are sparse).
    Scale: one data-sized hash agg to the (type, cell, daypart) grid;
    windows run per type over the value-domain-bounded frame."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.hour("ts") / 6).cast("int").alias("g"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    grid = (
        e.groupBy("event_type", "c")
        .pivot("g", [0, 1, 2, 3])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "event_type",
            "c",
            *[F.col(str(g)).cast("long").alias(f"n{g}") for g in range(4)],
        )
    )
    wx = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "event_type",
        "c",
        *[F.col(f"n{g}") for g in range(4)],
        *[
            F.coalesce(F.sum(f"n{g}").over(wx), F.lit(0))
            .cast("long")
            .alias(f"b{g}")
            for g in range(4)
        ],
    )
    pair_terms = None
    for i in range(4):
        for j in range(i + 1, 4):
            t = F.col(f"n{j}") * (
                F.lit(2) * F.col(f"b{i}") + F.col(f"n{i}")
            )
            pair_terms = t if pair_terms is None else pair_terms + t
    agg = cum.groupBy("event_type").agg(
        F.sum(pair_terms).cast("long").alias("j2"),
        *[F.sum(f"n{g}").cast("long").alias(f"t{g}") for g in range(4)],
    )
    n = F.col("t0") + F.col("t1") + F.col("t2") + F.col("t3")
    sum_sq = (
        F.col("t0") * F.col("t0")
        + F.col("t1") * F.col("t1")
        + F.col("t2") * F.col("t2")
        + F.col("t3") * F.col("t3")
    )
    sum_cu = (
        F.col("t0") * F.col("t0") * (2 * F.col("t0") + 3)
        + F.col("t1") * F.col("t1") * (2 * F.col("t1") + 3)
        + F.col("t2") * F.col("t2") * (2 * F.col("t2") + 3)
        + F.col("t3") * F.col("t3") * (2 * F.col("t3") + 3)
    )
    # doubled mean 2E = (n^2 - sum n_i^2) / 2 -- exact integer when
    # folded as (n*n - sum_sq), parity even by construction
    e2 = (n * n - sum_sq).cast("long")
    var = (
        (n * n * (2 * n + 3) - sum_cu).cast("double") / F.lit(72.0)
    )
    z = (F.col("j2").cast("double") - e2.cast("double") / F.lit(2.0)) / (
        F.lit(2.0) * F.sqrt(var)
    )
    varnum = n * n * (2 * n + 3) - sum_cu
    return (
        # positive variance in integer form: a single-group series
        # (all mass in one daypart) has Var = 0 and no z
        agg.where((n >= 2) & (varnum > 0))
        .select(
            "event_type",
            n.cast("long").alias("n_events"),
            F.col("j2").alias("j2_stat"),
            z.alias("z"),
        )
        .orderBy("event_type")
    )


EVENTS_JONCKHEERE_SQL = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(hour(ts) / 6) AS INT) AS g,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
grid AS (
  SELECT event_type, c,
         CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM ev GROUP BY event_type, c
),
cum AS (
  SELECT event_type, c, n0, n1, n2, n3,
         CAST(COALESCE(SUM(n0) OVER w, 0) AS BIGINT) AS b0,
         CAST(COALESCE(SUM(n1) OVER w, 0) AS BIGINT) AS b1,
         CAST(COALESCE(SUM(n2) OVER w, 0) AS BIGINT) AS b2,
         CAST(COALESCE(SUM(n3) OVER w, 0) AS BIGINT) AS b3
  FROM grid
  WINDOW w AS (PARTITION BY event_type ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
agg AS (
  SELECT event_type,
         CAST(SUM(n1 * (2 * b0 + n0)
                + n2 * (2 * b0 + n0) + n2 * (2 * b1 + n1)
                + n3 * (2 * b0 + n0) + n3 * (2 * b1 + n1)
                + n3 * (2 * b2 + n2)) AS BIGINT) AS j2,
         CAST(SUM(n0) AS BIGINT) AS t0, CAST(SUM(n1) AS BIGINT) AS t1,
         CAST(SUM(n2) AS BIGINT) AS t2, CAST(SUM(n3) AS BIGINT) AS t3
  FROM cum GROUP BY event_type
)
SELECT event_type,
       CAST(t0 + t1 + t2 + t3 AS BIGINT) AS n_events,
       j2 AS j2_stat,
       (CAST(j2 AS DOUBLE)
        - CAST((t0 + t1 + t2 + t3) * (t0 + t1 + t2 + t3)
               - (t0*t0 + t1*t1 + t2*t2 + t3*t3) AS DOUBLE) / 2.0)
         / (2.0 * sqrt(
             CAST((t0 + t1 + t2 + t3) * (t0 + t1 + t2 + t3)
                  * (2 * (t0 + t1 + t2 + t3) + 3)
                  - (t0*t0*(2*t0 + 3) + t1*t1*(2*t1 + 3)
                     + t2*t2*(2*t2 + 3) + t3*t3*(2*t3 + 3)) AS DOUBLE)
             / 72.0)) AS z
FROM agg
WHERE t0 + t1 + t2 + t3 >= 2
  AND (t0 + t1 + t2 + t3) * (t0 + t1 + t2 + t3)
      * (2 * (t0 + t1 + t2 + t3) + 3)
      - (t0*t0*(2*t0 + 3) + t1*t1*(2*t1 + 3)
         + t2*t2*(2*t2 + 3) + t3*t3*(2*t3 + 3)) > 0
ORDER BY event_type
"""


# ------------------------------------------- seasonal Mann-Kendall


def events_seasonal_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEASONAL (Hirsch-Slack) MANN-KENDALL trend test on daily value
    volume per event type: pairwise sign comparisons run only WITHIN
    the same weekday season (epoch-day d % 7 — engine week rules never
    consulted), so a strong weekly cycle cannot masquerade as trend —
    the screen events_mann_kendall needs on periodic series.

    Exactness: S folds integer signs over the CALENDAR-bounded
    same-season day pairs; per-season tie groups count by exact int64
    equality of daily sums; Var sums the per-season MK variance with
    the tie correction, one shared float z expression with continuity
    correction. Scale: the raw table collapses to (type, day) in one
    hash agg; the pair join is calendar-bounded (days^2/7)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("y")
    ).withColumn("season", F.pmod(F.col("d"), F.lit(7)).cast("long"))
    a = daily.select(
        "event_type",
        F.col("season").alias("season_a"),
        F.col("d").alias("da"),
        F.col("y").alias("ya"),
    )
    b = daily.select(
        "event_type",
        F.col("season").alias("season_b"),
        F.col("d").alias("db"),
        F.col("y").alias("yb"),
    )
    s = (
        a.join(b, "event_type")
        .where(
            (F.col("season_a") == F.col("season_b"))
            & (F.col("da") < F.col("db"))
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    seas = (
        daily.groupBy("event_type", "season", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type", "season")
        .agg(
            F.sum("t").cast("long").alias("ns"),
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tsum"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("ns").cast("long").alias("n_days"),
            F.sum(
                F.col("ns") * (F.col("ns") - 1) * (2 * F.col("ns") + 5)
                - F.col("tsum")
            )
            .cast("long")
            .alias("varnum"),
        )
    )
    var = F.col("varnum").cast("double") / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (sd - 1) / F.sqrt(var))
        .when(F.col("s_stat") < 0, (sd + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return s.join(F.broadcast(seas), "event_type").select(
        "event_type", "n_days", "s_stat", z.alias("z")
    ).orderBy("event_type")


EVENTS_SEASONAL_MK_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS y
  FROM events GROUP BY 1, 2
),
sd AS (SELECT event_type, d, y, d % 7 AS season FROM daily),
s AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM sd a JOIN sd b
    ON b.event_type = a.event_type AND b.season = a.season
   AND a.d < b.d
  GROUP BY a.event_type
),
seas AS (
  SELECT event_type,
         CAST(SUM(ns) AS BIGINT) AS n_days,
         CAST(SUM(ns * (ns - 1) * (2 * ns + 5) - tsum) AS BIGINT)
           AS varnum
  FROM (
    SELECT event_type, season,
           CAST(SUM(t) AS BIGINT) AS ns,
           CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
    FROM (
      SELECT event_type, season, y, CAST(COUNT(*) AS BIGINT) AS t
      FROM sd GROUP BY event_type, season, y
    ) GROUP BY event_type, season
  ) GROUP BY event_type
)
SELECT s.event_type, seas.n_days, s.s_stat,
       CASE WHEN s.s_stat > 0 THEN
              (CAST(s.s_stat AS DOUBLE) - 1)
              / sqrt(CAST(varnum AS DOUBLE) / 18.0)
            WHEN s.s_stat < 0 THEN
              (CAST(s.s_stat AS DOUBLE) + 1)
              / sqrt(CAST(varnum AS DOUBLE) / 18.0)
            ELSE 0.0 END AS z
FROM s JOIN seas ON seas.event_type = s.event_type
ORDER BY s.event_type
"""


# ------------------------------------------------ Poisson rate test


def events_poisson_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE POISSON RATE test of the daily event rate, weekend
    vs weekday, per type — the count-data companion to welch_t's value
    test: conditional on N = k1 + k2 total events, k1 ~ Binomial(N,
    p0 = t1/(t1+t2)) under equal rates, z = (k1 - N*p0) /
    sqrt(N*p0*(1-p0)).

    Exactness: event counts and the weekend/weekday day counts (off
    the pooled calendar of observed days, epoch-day % 7) are exact
    int64; z composes once in the same op order both engines. A span
    observing no weekend (t1 = 0) or no weekday (t2 = 0) epoch-days is
    filtered structurally on BOTH engines — rate_ratio and p0 would
    divide by zero (ADVICE r8). Scale: one data-sized hash agg; the
    calendar frame is span-bounded."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
    )
    is_we = F.pmod(F.col("d"), F.lit(7)).isin(2, 3)  # d0 = Thu: Sat=2 Sun=3
    cal = (
        e.select("d")
        .distinct()
        .agg(
            F.sum(F.when(is_we, 1).otherwise(0)).cast("long").alias("t1"),
            F.sum(F.when(is_we, 0).otherwise(1)).cast("long").alias("t2"),
        )
    )
    cnt = e.groupBy("event_type").agg(
        F.sum(F.when(is_we, 1).otherwise(0)).cast("long").alias("k1"),
        F.sum(F.when(is_we, 0).otherwise(1)).cast("long").alias("k2"),
    )
    j = cnt.crossJoin(F.broadcast(cal)).where(
        (F.col("t1") > 0) & (F.col("t2") > 0)
    )
    n = (F.col("k1") + F.col("k2")).cast("double")
    p0 = F.col("t1").cast("double") / (F.col("t1") + F.col("t2")).cast(
        "double"
    )
    z = (F.col("k1").cast("double") - n * p0) / F.sqrt(
        n * p0 * (F.lit(1.0) - p0)
    )
    rate_ratio = (
        F.col("k1").cast("double") / F.col("t1").cast("double")
    ) / (F.col("k2").cast("double") / F.col("t2").cast("double"))
    return j.select(
        "event_type",
        F.col("k1").alias("weekend_events"),
        F.col("k2").alias("weekday_events"),
        F.col("t1").alias("weekend_days"),
        F.col("t2").alias("weekday_days"),
        rate_ratio.alias("rate_ratio"),
        z.alias("z"),
    ).orderBy("event_type")


EVENTS_POISSON_RATE_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d
  FROM events
),
cal AS (
  SELECT CAST(SUM(CASE WHEN d % 7 IN (2, 3) THEN 1 ELSE 0 END)
              AS BIGINT) AS t1,
         CAST(SUM(CASE WHEN d % 7 IN (2, 3) THEN 0 ELSE 1 END)
              AS BIGINT) AS t2
  FROM (SELECT DISTINCT d FROM ev)
),
cnt AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN d % 7 IN (2, 3) THEN 1 ELSE 0 END)
              AS BIGINT) AS k1,
         CAST(SUM(CASE WHEN d % 7 IN (2, 3) THEN 0 ELSE 1 END)
              AS BIGINT) AS k2
  FROM ev GROUP BY event_type
)
SELECT event_type,
       k1 AS weekend_events, k2 AS weekday_events,
       t1 AS weekend_days, t2 AS weekday_days,
       (CAST(k1 AS DOUBLE) / CAST(t1 AS DOUBLE))
         / (CAST(k2 AS DOUBLE) / CAST(t2 AS DOUBLE)) AS rate_ratio,
       (CAST(k1 AS DOUBLE)
        - CAST(k1 + k2 AS DOUBLE)
          * (CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE)))
         / sqrt(CAST(k1 + k2 AS DOUBLE)
                * (CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE))
                * (1.0 - CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE)))
         AS z
FROM cnt CROSS JOIN cal
WHERE t1 > 0 AND t2 > 0
ORDER BY event_type
"""


# ------------------------------------------- lognormal length fit


def corpus_length_lognormal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOGNORMAL fit of document length per source: mu and sigma of
    ln(n_chars) plus the implied median exp(mu) — the distributional
    profile a curation rollout fits BEFORE setting Gopher length gates
    (web-text lengths are canonically lognormal; a source whose sigma
    breaks the pattern is mixed or truncated).

    Exactness: ln runs through the libm twin; each log quantizes onto
    the 2^-17 grid, so the first and second moments fold as int64
    (q <= ~2.6e6, q^2 <= ~7e12 — exact through ~1.3e6 docs per source,
    documented bound; the fold itself is order-free). mu, sigma and
    exp(mu) compose once from the two folds (libm exp). Scale: one
    Arrow-vectorized linear map + one hash agg."""
    from ..functions.libm import libm_exp, libm_log

    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    q = F.floor(
        libm_log(F.col("n_chars").cast("double")) * F.lit(float(_Q17))
        + F.lit(0.5)
    ).cast("long")
    agg = d.select("source", q.alias("q")).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
    )
    mu = F.col("s").cast("double") / (
        F.lit(float(_Q17)) * F.col("n_docs").cast("double")
    )
    ex2 = F.col("ss").cast("double") / (
        F.lit(float(_Q17)) * F.lit(float(_Q17)) * F.col("n_docs").cast(
            "double"
        )
    )
    sigma = F.sqrt(F.greatest(F.lit(0.0), ex2 - mu * mu))
    return agg.select(
        "source",
        "n_docs",
        mu.alias("mu"),
        sigma.alias("sigma"),
        libm_exp(mu).alias("median_chars"),
    ).orderBy("source")


CORPUS_LENGTH_LOGNORMAL_SQL = f"""
WITH q AS (
  SELECT source,
         CAST(FLOOR(ln(CAST(n_chars AS DOUBLE)) * {float(_Q17)!r} + 0.5)
              AS BIGINT) AS q
  FROM documents WHERE n_chars > 0
),
agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(q) AS BIGINT) AS s,
         CAST(SUM(q * q) AS BIGINT) AS ss
  FROM q GROUP BY source
)
SELECT source, n_docs,
       CAST(s AS DOUBLE) / ({float(_Q17)!r} * CAST(n_docs AS DOUBLE))
         AS mu,
       sqrt(GREATEST(0.0,
            CAST(ss AS DOUBLE)
              / ({float(_Q17)!r} * {float(_Q17)!r}
                 * CAST(n_docs AS DOUBLE))
            - (CAST(s AS DOUBLE)
               / ({float(_Q17)!r} * CAST(n_docs AS DOUBLE)))
              * (CAST(s AS DOUBLE)
                 / ({float(_Q17)!r} * CAST(n_docs AS DOUBLE)))))
         AS sigma,
       exp(CAST(s AS DOUBLE) / ({float(_Q17)!r} * CAST(n_docs AS DOUBLE)))
         AS median_chars
FROM agg
ORDER BY source
"""


# --------------------------------------------- Honoré R / Sichel S


def text_honore_sichel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HONORÉ'S R and SICHEL'S S per source — the other two classical
    frequency-spectrum constants next to text_yule_k: R = 100 ln(N) /
    (1 - V1/V) grows with productive vocabulary use; S = V2/V is
    near-constant for natural text and collapses on templated corpora.

    Exactness: N, V, V1, V2 are exact int64 off one (source, token)
    hash agg; ln(N) runs through the libm twin; R composes one
    division + one product in fixed order (sources where every type is
    hapax are emitted with NULL R via NULLIF on both engines). Scale:
    one token explode + two hash aggs, vocab x sources bounded."""
    from ..functions.libm import libm_log

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    tf = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    agg = tf.groupBy("source").agg(
        F.sum("f").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("long")
        .alias("v1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0))
        .cast("long")
        .alias("v2"),
    )
    gap = (F.col("v") - F.col("v1")).cast("double") / F.col("v").cast(
        "double"
    )
    r = (
        F.lit(100.0)
        * libm_log(F.col("n").cast("double"))
        / F.nullif(gap, F.lit(0.0))
    )
    return agg.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("vocab"),
        r.alias("honore_r"),
        (F.col("v2").cast("double") / F.col("v").cast("double")).alias(
            "sichel_s"
        ),
    ).orderBy("source")


TEXT_HONORE_SICHEL_SQL = """
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
  SELECT source, CAST(SUM(f) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
  FROM tf GROUP BY source
)
SELECT source, n AS n_tokens, v AS vocab,
       100.0 * ln(CAST(n AS DOUBLE))
         / NULLIF(CAST(v - v1 AS DOUBLE) / CAST(v AS DOUBLE), 0.0)
         AS honore_r,
       CAST(v2 AS DOUBLE) / CAST(v AS DOUBLE) AS sichel_s
FROM agg
ORDER BY source
"""


# ------------------------------------- time-series similarity search


def events_series_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-SERIES SIMILARITY SEARCH over per-user daily activity: for
    the 8 lowest user ids, the top-5 most-correlated other users by
    Pearson r of their zero-filled daily event-count series — the
    "find tenants that behave like this one" retrieval the streaming
    literature builds sketch indexes for (EDBT'19 similarity-search
    shape; brute-force twin here, the same baseline-vs-index contract
    as simsearch_brute_force).

    Exactness: zero days need NO materialization — with D the global
    day count, r's sufficient statistics (sum x, sum x^2 over present
    days; sum xy over the inner join of present days, zeros contribute
    nothing) are all exact int64, and r composes once as (D*Sxy -
    Sx*Sy) / (sqrt(D*Sxx - Sx^2) * sqrt(D*Syy - Sy^2)). Top-5 breaks
    float ties by neighbor id. Scale: one data-sized hash agg to the
    (user, day) frame; the query side is 8 users' series (broadcast),
    so the score join is |users|-dimension bounded."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
    )
    days = e.agg(F.countDistinct("d").cast("long").alias("dd"))
    ud = e.groupBy("user_id", "d").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    stats = ud.groupBy("user_id").agg(
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    q_ud = ud.where(F.col("user_id") < 8).select(
        F.col("user_id").alias("query_id"),
        "d",
        F.col("x").alias("qx"),
    )
    sxy = (
        F.broadcast(q_ud)
        .join(ud, "d")
        .where(F.col("user_id") != F.col("query_id"))
        .groupBy("query_id", "user_id")
        .agg(F.sum(F.col("qx") * F.col("x")).cast("long").alias("sxy"))
    )
    q_stats = stats.where(F.col("user_id") < 8).select(
        F.col("user_id").alias("query_id"),
        F.col("sx").alias("qsx"),
        F.col("sxx").alias("qsxx"),
    )
    j = (
        sxy.join(F.broadcast(q_stats), "query_id")
        .join(stats, "user_id")
        .crossJoin(F.broadcast(days))
        # zero-variance series (constant daily counts) have no defined
        # r: filter BEFORE the division — ANSI Spark would throw where
        # DuckDB yields NULL, so the guard must be structural
        .where(
            (F.col("dd") * F.col("qsxx") - F.col("qsx") * F.col("qsx") > 0)
            & (F.col("dd") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        )
    )
    num = (
        F.col("dd") * F.col("sxy") - F.col("qsx") * F.col("sx")
    ).cast("double")
    den = F.sqrt(
        (F.col("dd") * F.col("qsxx") - F.col("qsx") * F.col("qsx")).cast(
            "double"
        )
    ) * F.sqrt(
        (F.col("dd") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    scored = j.select(
        "query_id",
        F.col("user_id").alias("neighbor_id"),
        (num / den).alias("r"),
    ).where(F.col("r").isNotNull())
    w = Window.partitionBy("query_id").orderBy(
        F.desc("r"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


EVENTS_SERIES_SIMILARITY_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d
  FROM events
),
days AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS dd FROM ev),
ud AS (
  SELECT user_id, d, CAST(COUNT(*) AS BIGINT) AS x
  FROM ev GROUP BY user_id, d
),
stats AS (
  SELECT user_id, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM ud GROUP BY user_id
),
sxy AS (
  SELECT q.user_id AS query_id, c.user_id,
         CAST(SUM(q.x * c.x) AS BIGINT) AS sxy
  FROM ud q JOIN ud c ON c.d = q.d AND c.user_id <> q.user_id
  WHERE q.user_id < 8
  GROUP BY q.user_id, c.user_id
),
scored AS (
  SELECT s.query_id, s.user_id AS neighbor_id,
         CAST(days.dd * s.sxy - qs.sx * cs.sx AS DOUBLE)
           / (sqrt(CAST(days.dd * qs.sxx - qs.sx * qs.sx AS DOUBLE))
              * sqrt(CAST(days.dd * cs.sxx - cs.sx * cs.sx AS DOUBLE)))
           AS r
  FROM sxy s
  JOIN stats qs ON qs.user_id = s.query_id
  JOIN stats cs ON cs.user_id = s.user_id
  CROSS JOIN days
  WHERE days.dd * qs.sxx - qs.sx * qs.sx > 0
    AND days.dd * cs.sxx - cs.sx * cs.sx > 0
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY r DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM scored WHERE r IS NOT NULL
)
SELECT query_id, neighbor_id, r, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


# ------------------------------------------------- SAX motif counts


def events_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX MOTIF DISCOVERY on daily volume per event type: each full
    week becomes a 7-symbol SAX word (per-day z-score against the
    type's own mean/sd, 4-symbol alphabet at the standard N(0,1)
    quartile breakpoints +-0.6745), and recurring words are the
    series' motifs — the iSAX-lineage symbolic index shape, reduced to
    its audit ("does this type have a repeating weekly signature?").

    Exactness: daily counts int64 on the observed calendar (weeks are
    epoch-day offsets from the type's first day, DIV/% 7 — engine week
    rules never consulted); mu/sd compose the welch recipe once; the
    symbol compare z < breakpoint uses literals identical on both
    engines; words assemble by ORDER BY day-in-week string_agg (Spark:
    sorted-struct array transform). Scale: one data-sized hash agg to
    (type, day); everything after is calendar-bounded."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
    )
    daily = e.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    stats = daily.groupBy("event_type").agg(
        F.min("d").cast("long").alias("d0"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    m = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("q").cast("double") / F.col("n").cast("double") - m * m
    ) * (F.col("n").cast("double") / (F.col("n") - 1).cast("double"))
    z = (F.col("x").cast("double") - m) / F.sqrt(var)
    sym = (
        F.when(z < F.lit(-0.6745), F.lit("a"))
        .when(z < F.lit(0.0), F.lit("b"))
        .when(z < F.lit(0.6745), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    sd = (
        daily.join(F.broadcast(stats), "event_type")
        # positive variance in integer form: a constant daily series
        # has no z-scores and would hit ANSI divide-by-zero
        .where(
            (F.col("n") > 1)
            & (F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0)
        )
        .select(
            "event_type",
            ((F.col("d") - F.col("d0")) / 7).cast("long").alias("wk"),
            F.pmod(F.col("d") - F.col("d0"), F.lit(7))
            .cast("long")
            .alias("dow"),
            sym.alias("sym"),
        )
    )
    words = (
        sd.groupBy("event_type", "wk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dow", "sym"))
                    ),
                    lambda s: s.sym,
                ),
                "",
            ).alias("word"),
        )
        .where(F.col("n_days") == 7)
    )
    return (
        words.groupBy("event_type", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_weeks"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("n_weeks"), F.asc("word")
                )
            ),
        )
        .where(F.col("rk") <= 3)
        .select("event_type", "word", "n_weeks")
        .orderBy("event_type", F.desc("n_weeks"), "word")
    )


EVENTS_SAX_MOTIFS_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d
  FROM events
),
daily AS (
  SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS x
  FROM ev GROUP BY event_type, d
),
stats AS (
  SELECT event_type, CAST(MIN(d) AS BIGINT) AS d0,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS q
  FROM daily GROUP BY event_type
),
sd AS (
  SELECT daily.event_type,
         CAST((daily.d - st.d0) // 7 AS BIGINT) AS wk,
         CAST((daily.d - st.d0) % 7 AS BIGINT) AS dow,
         CASE WHEN (CAST(daily.x AS DOUBLE)
                    - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                   / sqrt((CAST(st.q AS DOUBLE) / CAST(st.n AS DOUBLE)
                           - (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                             * (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))
                          * (CAST(st.n AS DOUBLE)
                             / CAST(st.n - 1 AS DOUBLE)))
                   < -0.6745 THEN 'a'
              WHEN (CAST(daily.x AS DOUBLE)
                    - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                   / sqrt((CAST(st.q AS DOUBLE) / CAST(st.n AS DOUBLE)
                           - (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                             * (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))
                          * (CAST(st.n AS DOUBLE)
                             / CAST(st.n - 1 AS DOUBLE)))
                   < 0.0 THEN 'b'
              WHEN (CAST(daily.x AS DOUBLE)
                    - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                   / sqrt((CAST(st.q AS DOUBLE) / CAST(st.n AS DOUBLE)
                           - (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                             * (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))
                          * (CAST(st.n AS DOUBLE)
                             / CAST(st.n - 1 AS DOUBLE)))
                   < 0.6745 THEN 'c'
              ELSE 'd' END AS sym
  FROM daily JOIN stats st ON st.event_type = daily.event_type
  WHERE st.n > 1 AND st.n * st.q - st.s * st.s > 0
),
words AS (
  SELECT event_type, wk, CAST(COUNT(*) AS BIGINT) AS n_days,
         string_agg(sym, '' ORDER BY dow) AS word
  FROM sd GROUP BY event_type, wk
),
counted AS (
  SELECT event_type, word, CAST(COUNT(*) AS BIGINT) AS n_weeks
  FROM words WHERE n_days = 7
  GROUP BY event_type, word
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY n_weeks DESC, word ASC) AS rk
  FROM counted
)
SELECT event_type, word, n_weeks FROM ranked WHERE rk <= 3
ORDER BY event_type, n_weeks DESC, word
"""


QUERIES = {
    "events_cochran_q": events_cochran_q,
    "events_jonckheere": events_jonckheere,
    "events_seasonal_mann_kendall": events_seasonal_mann_kendall,
    "events_poisson_rate": events_poisson_rate,
    "corpus_length_lognormal": corpus_length_lognormal,
    "text_honore_sichel": text_honore_sichel,
    "events_series_similarity": events_series_similarity,
    "events_sax_motifs": events_sax_motifs,
}

ORACLES = {
    "events_cochran_q": EVENTS_COCHRAN_Q_SQL,
    "events_jonckheere": EVENTS_JONCKHEERE_SQL,
    "events_seasonal_mann_kendall": EVENTS_SEASONAL_MK_SQL,
    "events_poisson_rate": EVENTS_POISSON_RATE_SQL,
    "corpus_length_lognormal": CORPUS_LENGTH_LOGNORMAL_SQL,
    "text_honore_sichel": TEXT_HONORE_SICHEL_SQL,
    "events_series_similarity": EVENTS_SERIES_SIMILARITY_SQL,
    "events_sax_motifs": EVENTS_SAX_MOTIFS_SQL,
}
