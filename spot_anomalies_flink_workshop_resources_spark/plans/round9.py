"""Round-9 additions (capped at 15 per VERDICT r8 #1): marketing
attribution, training-data mixing, growth analytics, signal-scale
decomposition, and embedding-quality evaluation.

Every query follows the repo's exactness contract: integer sufficient
statistics (cents / count grids) folded in map-side-combinable hash
aggs, transcendentals through the libm twin (functions/libm.py —
bit-matches DuckDB), float compositions in ONE fixed op order shared
with the oracle, and possibly-zero denominators filtered structurally
on BOTH engines. The reference's scope ends at fixed-threshold
detection (AD.java:200); this layer is beyond-reference by design
(SURVEY.md §2 extension family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

_Q20 = 1 << 20


# -------------------------------------------- temporal drift audit


def dq_temporal_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING/SERVING SKEW audit: split the event span at its
    midpoint day and compare each type's daily arrival rate and mean
    value between halves — the first screen a feature-store rollout
    runs before trusting a model trained on the first half ("did the
    data move under us?").

    Exactness: the split day is integer epoch-day midpoint ((d0 + d1)
    DIV 2 — engine-identical integer division); per-half counts and
    cents sums are exact int64; rate_ratio and mean_shift each compose
    in one fixed float expression. Types absent from either half are
    filtered structurally (their ratio would divide by zero). Scale:
    ONE data-sized hash agg to (type, half); the span scalar
    broadcasts."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    span = e.agg(
        F.min("d").cast("long").alias("d0"),
        F.max("d").cast("long").alias("d1"),
    ).select(
        "d0", "d1", F.expr("(d0 + d1) DIV 2").cast("long").alias("mid")
    )
    agg = (
        e.crossJoin(F.broadcast(span))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("d") > F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n2"),
            F.sum(F.when(F.col("d") <= F.col("mid"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("s1"),
            F.sum(F.when(F.col("d") > F.col("mid"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("s2"),
            F.min("d0").alias("d0"),
            F.min("d1").alias("d1"),
            F.min("mid").alias("mid"),
        )
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
    )
    days1 = (F.col("mid") - F.col("d0") + 1).cast("double")
    days2 = (F.col("d1") - F.col("mid")).cast("double")
    m1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    m2 = F.col("s2").cast("double") / F.col("n2").cast("double")
    return agg.select(
        "event_type",
        F.col("n1").alias("n_first"),
        F.col("n2").alias("n_second"),
        (
            (F.col("n2").cast("double") / days2)
            / (F.col("n1").cast("double") / days1)
        ).alias("rate_ratio"),
        ((m2 - m1) / F.lit(100.0)).alias("mean_shift"),
    ).orderBy("event_type")


DQ_TEMPORAL_DRIFT_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
span AS (
  SELECT CAST(MIN(d) AS BIGINT) AS d0, CAST(MAX(d) AS BIGINT) AS d1,
         CAST((MIN(d) + MAX(d)) // 2 AS BIGINT) AS mid
  FROM ev
),
agg AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN d <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN d > mid THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN d <= mid THEN c ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN d > mid THEN c ELSE 0 END) AS BIGINT) AS s2,
         MIN(d0) AS d0, MIN(d1) AS d1, MIN(mid) AS mid
  FROM ev CROSS JOIN span
  GROUP BY event_type
)
SELECT event_type, n1 AS n_first, n2 AS n_second,
       (CAST(n2 AS DOUBLE) / CAST(d1 - mid AS DOUBLE))
         / (CAST(n1 AS DOUBLE) / CAST(mid - d0 + 1 AS DOUBLE))
         AS rate_ratio,
       (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
        - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / 100.0 AS mean_shift
FROM agg
WHERE n1 > 0 AND n2 > 0
ORDER BY event_type
"""


# ------------------------------------------ new vs returning split


def sql_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW vs RETURNING revenue split per calendar month — the growth
    dashboard's first row ("is this month's revenue acquisition or
    retention?"). An order is NEW when its month equals the customer's
    first-ever order month (every first-month order counts as new),
    RETURNING otherwise.

    Exactness: months are integer year*100+month; the first month per
    customer is an integer MIN; revenue is exact int64 cents; the
    share is ONE division. Scale: orders collapse to the customer
    dimension in one hash agg for the first-month frame, then a KEYED
    join back (never data x data) and one (month) hash agg."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(F.min("ym").alias("first_ym"))
    j = o.join(first, "o_custkey").withColumn(
        "is_new", (F.col("ym") == F.col("first_ym")).cast("int")
    )
    agg = j.groupBy("ym").agg(
        F.sum("is_new").cast("long").alias("n_new_orders"),
        F.sum(1 - F.col("is_new")).cast("long").alias("n_returning_orders"),
        F.sum(F.when(F.col("is_new") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("new_cents"),
        F.sum(F.when(F.col("is_new") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("ret_cents"),
    )
    return agg.select(
        "ym",
        "n_new_orders",
        "n_returning_orders",
        (F.col("new_cents").cast("double") / F.lit(100.0)).alias(
            "new_revenue"
        ),
        (F.col("ret_cents").cast("double") / F.lit(100.0)).alias(
            "returning_revenue"
        ),
        (
            F.col("new_cents").cast("double")
            / (F.col("new_cents") + F.col("ret_cents")).cast("double")
        ).alias("new_revenue_share"),
    ).orderBy("ym")


SQL_NEW_VS_RETURNING_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS ym,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
first_m AS (
  SELECT o_custkey, MIN(ym) AS first_ym FROM o GROUP BY o_custkey
),
j AS (
  SELECT o.ym, o.cents,
         CASE WHEN o.ym = f.first_ym THEN 1 ELSE 0 END AS is_new
  FROM o JOIN first_m f ON f.o_custkey = o.o_custkey
),
agg AS (
  SELECT ym,
         CAST(SUM(is_new) AS BIGINT) AS n_new_orders,
         CAST(SUM(1 - is_new) AS BIGINT) AS n_returning_orders,
         CAST(SUM(CASE WHEN is_new = 1 THEN cents ELSE 0 END) AS BIGINT)
           AS new_cents,
         CAST(SUM(CASE WHEN is_new = 0 THEN cents ELSE 0 END) AS BIGINT)
           AS ret_cents
  FROM j GROUP BY ym
)
SELECT ym, n_new_orders, n_returning_orders,
       CAST(new_cents AS DOUBLE) / 100.0 AS new_revenue,
       CAST(ret_cents AS DOUBLE) / 100.0 AS returning_revenue,
       CAST(new_cents AS DOUBLE) / CAST(new_cents + ret_cents AS DOUBLE)
         AS new_revenue_share
FROM agg
ORDER BY ym
"""


# ------------------------------------------------------ HHI trend


def sql_hhi_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN concentration of supplier revenue PER SHIP
    YEAR — the market-structure trend sql_supplier_hhi's single static
    index cannot show ("is the supply base consolidating?").

    Exactness: per-(year, supplier) revenue is exact int64 cents; each
    supplier's share quantizes onto the 2^-20 grid via INTEGER
    division (s * 2^20 DIV total — engine-identical truncation, and
    the bounded-numerator form that stays exact at any sf where the
    earlier int64 sum-of-squares recipe would overflow); HHI is the
    int64 sum of squared quantized shares divided once by 2^40. Scale:
    lineitem collapses to the (year, supplier) dimension in one hash
    agg; everything after is dimension-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    per = li.groupBy(
        F.year("l_shipdate").cast("long").alias("yr"),
        F.col("l_suppkey"),
    ).agg(F.sum(cents).cast("long").alias("rev"))
    tot = per.groupBy("yr").agg(
        F.sum("rev").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    q = (
        per.join(tot, "yr")
        .select(
            "yr",
            "n_suppliers",
            F.expr(f"(rev * {_Q20}) DIV tot").cast("long").alias("qs"),
        )
        .groupBy("yr", "n_suppliers")
        .agg(F.sum(F.col("qs") * F.col("qs")).cast("long").alias("hq"))
    )
    return q.select(
        "yr",
        "n_suppliers",
        (F.col("hq").cast("double") / F.lit(float(_Q20 * _Q20))).alias(
            "hhi"
        ),
    ).orderBy("yr")


SQL_HHI_TREND_SQL = f"""
WITH per AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, l_suppkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT yr, CAST(SUM(rev) AS BIGINT) AS tot,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM per GROUP BY yr
),
q AS (
  SELECT per.yr, tot.n_suppliers,
         CAST(SUM(((per.rev * {_Q20}) // tot.tot)
                  * ((per.rev * {_Q20}) // tot.tot)) AS BIGINT) AS hq
  FROM per JOIN tot ON tot.yr = per.yr
  GROUP BY per.yr, tot.n_suppliers
)
SELECT yr, n_suppliers,
       CAST(hq AS DOUBLE) / {float(_Q20) * float(_Q20)!r} AS hhi
FROM q
ORDER BY yr
"""


# --------------------------------------------- discount elasticity


def sql_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCOUNT RESPONSE: mean order quantity at each discount level
    plus the OLS slope of mean quantity on the discount percentage —
    the "does discounting move volume?" readout a pricing team reads
    before deepening promotions (TPC-H Q6 asks the revenue side; this
    asks the demand side).

    Exactness: quantity sums and counts are exact int64 per discount
    level (l_discount lands on an exact percent grid, stored x100);
    the OLS slope/intercept/r2 compose from SIX exact integer
    sufficient statistics over the <=11-level frame in one fixed float
    expression (the events_trend_ols recipe). Scale: ONE data-sized
    hash agg to the discount-level dimension; the regression frame is
    11 rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("pct"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
    )
    lvl = li.groupBy("pct").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty").cast("long").alias("sq"),
    )
    # OLS of y = mean qty per level on x = pct, weighted equally by
    # level (11 points): sufficient stats quantize the means onto the
    # 2^-20 grid as int64 so the fold is order-free.
    ym = F.expr(f"(sq * {_Q20}) DIV n").cast("long")
    stats = lvl.select(
        "pct", ym.alias("ymq"), F.col("n"), F.col("sq")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("pct").cast("long").alias("sx"),
        F.sum(F.col("pct") * F.col("pct")).cast("long").alias("sxx"),
        F.sum("ymq").cast("long").alias("sy"),
        F.sum(F.col("pct") * F.col("ymq")).cast("long").alias("sxy"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.col("ymq") * F.col("ymq")).cast("long").alias("syy"),
    )
    stats = stats.where(
        (F.col("k") > 1)
        & (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
    )
    kd = F.col("k").cast("double")
    num = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    slope_q = num / den  # grid-units of mean qty per discount point
    return stats.select(
        F.col("k").alias("n_levels"),
        F.col("n_rows").alias("n_lineitems"),
        (slope_q / F.lit(float(_Q20))).alias("qty_per_discount_point"),
        (
            (
                F.col("sy").cast("double") / kd
                - (slope_q) * (F.col("sx").cast("double") / kd)
            )
            / F.lit(float(_Q20))
        ).alias("intercept_qty"),
        (num * num / (den * deny)).alias("r2"),
    )


SQL_DISCOUNT_ELASTICITY_SQL = f"""
WITH li AS (
  SELECT CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS pct,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty
  FROM lineitem
),
lvl AS (
  SELECT pct, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qty) AS BIGINT) AS sq
  FROM li GROUP BY pct
),
pts AS (
  SELECT pct, n, CAST((sq * {_Q20}) // n AS BIGINT) AS ymq FROM lvl
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(pct) AS BIGINT) AS sx,
         CAST(SUM(pct * pct) AS BIGINT) AS sxx,
         CAST(SUM(ymq) AS BIGINT) AS sy,
         CAST(SUM(pct * ymq) AS BIGINT) AS sxy,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(SUM(ymq * ymq) AS BIGINT) AS syy
  FROM pts
)
SELECT k AS n_levels, n_rows AS n_lineitems,
       (CAST(k * sxy - sx * sy AS DOUBLE)
        / CAST(k * sxx - sx * sx AS DOUBLE)) / {float(_Q20)!r}
         AS qty_per_discount_point,
       (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE)
        - (CAST(k * sxy - sx * sy AS DOUBLE)
           / CAST(k * sxx - sx * sx AS DOUBLE))
          * (CAST(sx AS DOUBLE) / CAST(k AS DOUBLE))) / {float(_Q20)!r}
         AS intercept_qty,
       (CAST(k * sxy - sx * sy AS DOUBLE)
        * CAST(k * sxy - sx * sy AS DOUBLE))
         / (CAST(k * sxx - sx * sx AS DOUBLE)
            * CAST(k * syy - sy * sy AS DOUBLE)) AS r2
FROM stats
WHERE k > 1 AND k * sxx - sx * sx > 0
"""


# ------------------------------------------- temperature mixing


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED mixture weights per source (T = 0.7): w_i
    proportional to p_i^T with p_i the source's token share — the
    standard multilingual/multi-source rebalancing rule (upsamples the
    tail, tempers the head) a training-data pipeline applies between
    corpus_mixture_weights' raw shares and the sampler.

    Exactness: token counts are exact int64 off one (source) hash agg
    (the text_yule_k tokenizer); p_i^0.7 = exp(0.7 * ln p_i) runs
    through the libm twins so both engines produce the identical
    double; each q_i quantizes onto the 2^-20 grid BEFORE the int64
    normalization sum (order-free), and each weight is ONE division.
    Scale: one token explode + one hash agg to the source dimension;
    the libm pass is Arrow-vectorized over the |sources| frame."""
    from ..functions.libm import libm_exp, libm_log

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    per = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").cast("long").alias("tot"))
    p = F.col("n_tokens").cast("double") / F.col("tot").cast("double")
    q = libm_exp(F.lit(0.7) * libm_log(p))
    qq = F.floor(q * F.lit(float(_Q20)) + F.lit(0.5)).cast("long")
    scored = per.crossJoin(F.broadcast(tot)).select(
        "source", "n_tokens", p.alias("p_raw"), qq.alias("qq")
    )
    norm = scored.agg(F.sum("qq").cast("long").alias("z"))
    return (
        scored.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_tokens",
            "p_raw",
            (F.col("qq").cast("double") / F.col("z").cast("double")).alias(
                "w_temperature"
            ),
        )
        .orderBy("source")
    )


CORPUS_TEMPERATURE_MIX_SQL = f"""
WITH toks AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY source
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM per),
scored AS (
  SELECT source, n_tokens,
         CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS p_raw,
         CAST(FLOOR(exp(0.7 * ln(CAST(n_tokens AS DOUBLE)
                                 / CAST(tot AS DOUBLE)))
                    * {float(_Q20)!r} + 0.5) AS BIGINT) AS qq
  FROM per CROSS JOIN tot
),
norm AS (SELECT CAST(SUM(qq) AS BIGINT) AS z FROM scored)
SELECT source, n_tokens, p_raw,
       CAST(qq AS DOUBLE) / CAST(z AS DOUBLE) AS w_temperature
FROM scored CROSS JOIN norm
ORDER BY source
"""


QUERIES = {
    "dq_temporal_drift": dq_temporal_drift,
    "sql_new_vs_returning": sql_new_vs_returning,
    "sql_hhi_trend": sql_hhi_trend,
    "sql_discount_elasticity": sql_discount_elasticity,
    "corpus_temperature_mix": corpus_temperature_mix,
}

ORACLES = {
    "dq_temporal_drift": DQ_TEMPORAL_DRIFT_SQL,
    "sql_new_vs_returning": SQL_NEW_VS_RETURNING_SQL,
    "sql_hhi_trend": SQL_HHI_TREND_SQL,
    "sql_discount_elasticity": SQL_DISCOUNT_ELASTICITY_SQL,
    "corpus_temperature_mix": CORPUS_TEMPERATURE_MIX_SQL,
}
