"""Round-8 fifth wave: ANN recall-vs-probe evaluation, dedup yield
accounting, ingestion id-continuity DQ, and an ordered-proportion
trend test.

The recall CURVE is the number an ANN rollout actually tunes on —
recall@k against the exact brute-force baseline at nprobe 1/2/4 (the
knob simsearch_ivf_probe2 exposes, now measured instead of assumed).
The dedup TOKEN-LOSS accounting answers "what does exact dedup cost
us, per source, in training tokens" — the go/no-go readout next to
dedup_rate_curve's pair counts. The id-continuity audit is the classic
ingestion screen (duplicate ids, range holes) expressed WITHOUT any
data-sized window — two O(n) aggregates. The COCHRAN-ARMITAGE trend
test asks whether the urgent-order share drifts across calendar years
— the ordered-categories companion to events_chi2_independence.

Exactness: integer sufficient statistics everywhere; the CA z composes
once from int64 sums; recall joins are integer set intersections; the
only floats are final divisions. The reference's scope ends at
fixed-threshold detection (AD.java:200); this layer is
beyond-reference by design (SURVEY.md §2 extension family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


# ------------------------------------------------ IVF recall curve


def simsearch_ivf_recall_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RECALL@5 of the IVF index vs the exact brute-force baseline at
    nprobe = 1, 2, 4 — the recall/latency tradeoff table an ANN
    deployment reads before picking its probe count (multi-probe scans
    ~nprobe/n_centroids of the corpus; this query says what that buys).

    Exactness: both sides are the ALREADY-ORACLED operators
    (operators/simsearch.brute_force_topk / ivf_topk with
    deterministic seed centroids); recall is an integer set
    intersection over (query, neighbor) pairs divided once. Scale: the
    probe sweep reuses one assignment pass per probe count over the
    bucketed lists — the documented IVF cost shape; the eval join is
    (n_queries x k)-bounded."""
    from ..operators import simsearch as S

    brute = S.brute_force_topk(load_table(spark, sf_dir, "embeddings"))
    bpairs = brute.select("query_id", "neighbor_id")
    n_pairs = 8 * 5
    parts = []
    for p in (1, 2, 4):
        ivf = S.ivf_topk(
            load_table(spark, sf_dir, "embeddings"), n_probes=p
        ).select("query_id", "neighbor_id")
        hits = ivf.join(bpairs, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).cast("long").alias("n_hits")
        )
        parts.append(
            hits.select(
                F.lit(p).cast("long").alias("n_probes"),
                F.col("n_hits"),
                (
                    F.col("n_hits").cast("double") / F.lit(float(n_pairs))
                ).alias("recall_at_5"),
            )
        )
    out = parts[0]
    for frame in parts[1:]:
        out = out.unionAll(frame)
    return out.orderBy("n_probes")


def _simsearch_ivf_recall_curve_sql() -> str:
    from ..operators.simsearch import brute_force_topk_sql, ivf_topk_sql

    blocks = []
    for p in (1, 2, 4):
        blocks.append(
            f"""
SELECT CAST({p} AS BIGINT) AS n_probes,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS DOUBLE) / 40.0 AS recall_at_5
FROM ({ivf_topk_sql(n_probes=p)}) i
JOIN ({brute_force_topk_sql()}) b
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id"""
        )
    return " UNION ALL ".join(blocks) + "\nORDER BY n_probes"


# ---------------------------------------------- dedup token loss


def corpus_dedup_token_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-DEDUP YIELD ACCOUNTING per source: how many documents and
    training TOKENS survive md5-exact text dedup (first doc_id wins,
    the dedup_exact survivor rule), and the token share lost to
    duplicate copies — the cost/benefit line a curation rollout reports
    next to dedup_rate_curve's pair counts.

    Exactness: token counts use the engine token rule ([a-z0-9]+),
    survivorship is integer min(doc_id) per (source, md5); every
    output is int64 with ONE division. Scale: one data-sized hash agg
    to (source, hash) with min/sum combiners — the dedup_exact shape;
    no window, no join."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        F.md5(F.col("text")).alias("h"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        )
        .cast("long")
        .alias("n_tok"),
    )
    per_hash = toks.groupBy("source", "h").agg(
        F.count(F.lit(1)).cast("long").alias("copies"),
        F.sum("n_tok").cast("long").alias("tok_all"),
        F.min(F.struct("doc_id", "n_tok")).alias("survivor"),
    )
    agg = per_hash.groupBy("source").agg(
        F.sum("copies").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum("tok_all").cast("long").alias("tokens_before"),
        F.sum(F.col("survivor.n_tok")).cast("long").alias("tokens_after"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_unique",
        "tokens_before",
        "tokens_after",
        (
            (F.col("tokens_before") - F.col("tokens_after")).cast("double")
            / F.col("tokens_before").cast("double")
        ).alias("token_loss_share"),
    ).orderBy("source")


CORPUS_DEDUP_TOKEN_LOSS_SQL = """
WITH toks AS (
  SELECT source, doc_id, md5(text) AS h,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS BIGINT) AS n_tok
  FROM documents
),
per_hash AS (
  SELECT source, h,
         CAST(COUNT(*) AS BIGINT) AS copies,
         CAST(SUM(n_tok) AS BIGINT) AS tok_all,
         CAST(MIN(doc_id) AS BIGINT) AS sdoc
  FROM toks GROUP BY source, h
),
surv AS (
  SELECT p.source, p.copies, p.tok_all, t.n_tok AS s_tok
  FROM per_hash p
  JOIN toks t ON t.source = p.source AND t.h = p.h AND t.doc_id = p.sdoc
),
agg AS (
  SELECT source,
         CAST(SUM(copies) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_unique,
         CAST(SUM(tok_all) AS BIGINT) AS tokens_before,
         CAST(SUM(s_tok) AS BIGINT) AS tokens_after
  FROM surv GROUP BY source
)
SELECT source, n_docs, n_unique, tokens_before, tokens_after,
       CAST(tokens_before - tokens_after AS DOUBLE)
         / CAST(tokens_before AS DOUBLE) AS token_loss_share
FROM agg
ORDER BY source
"""


# ------------------------------------------------ id continuity DQ


def dq_id_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID-CONTINUITY audit of the events stream: duplicate event_ids,
    holes in the id range, and coverage — the first screen an
    ingestion incident review runs ("did the producer skip or repeat
    sequence numbers?").

    Exactness: every output is an exact int64 off two aggregates
    (count, countDistinct, min, max); shares are ONE division. Scale:
    deliberately NO data-sized window — a naive max-gap needs a global
    id sort, so the audit reports range holes (max-min+1 minus
    distinct) instead, which two O(n) map-side-combinable aggs
    deliver at any scale."""
    e = load_table(spark, sf_dir, "events").select("event_id")
    agg = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("event_id").cast("long").alias("n_ids"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
    )
    span = F.col("max_id") - F.col("min_id") + 1
    return agg.select(
        "n_rows",
        "n_ids",
        "min_id",
        "max_id",
        (F.col("n_rows") - F.col("n_ids")).alias("duplicate_rows"),
        (span - F.col("n_ids")).alias("missing_in_range"),
        (
            F.col("n_ids").cast("double") / span.cast("double")
        ).alias("range_coverage"),
    )


DQ_ID_CONTINUITY_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id,
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
         AS duplicate_rows,
       CAST(MAX(event_id) - MIN(event_id) + 1 - COUNT(DISTINCT event_id)
            AS BIGINT) AS missing_in_range,
       CAST(COUNT(DISTINCT event_id) AS DOUBLE)
         / CAST(MAX(event_id) - MIN(event_id) + 1 AS DOUBLE)
         AS range_coverage
FROM events
"""


# ------------------------------------- Cochran-Armitage trend test


def sql_priority_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-ARMITAGE trend test: does the share of URGENT/HIGH
    priority orders drift monotonically across calendar years? The
    ordered-categories companion to a plain chi-square — years carry
    integer scores, so a monotone mix shift shows up as trend, not
    just heterogeneity.

    Exactness: per-year totals n_i, successes x_i and CENTERED scores
    w_i = year - min_year are exact int64 (centering keeps every
    sufficient statistic < 2^53 at any sf, so the double casts are
    exact); z composes once from the six statistics in the SAME op
    order both engines (the welch_t staging recipe), one sqrt. The
    degenerate frames where var = 0 — a single observed order-year, or
    urgent share exactly 0 or 1 — are filtered structurally in INTEGER
    form on BOTH engines (n_years > 1 AND 0 < xx < nn; with centered
    integer scores and n_years > 1 the score variance term is strictly
    positive), so ANSI Spark never divides by zero (ADVICE r8). Scale:
    one hash agg to the |years| frame."""
    o = load_table(spark, sf_dir, "orders")
    yr = o.select(
        F.year("o_orderdate").cast("long").alias("y"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("is_urgent"),
    )
    y0 = yr.agg(F.min("y").alias("y0"))
    per_year = (
        yr.crossJoin(F.broadcast(y0))
        .select((F.col("y") - F.col("y0")).alias("w"), "is_urgent")
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("is_urgent").cast("long").alias("x"),
        )
    )
    agg = per_year.agg(
        F.count(F.lit(1)).cast("long").alias("n_years"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("x").cast("long").alias("xx"),
        F.sum(F.col("x") * F.col("w")).cast("long").alias("sxw"),
        F.sum(F.col("n") * F.col("w")).cast("long").alias("snw"),
        F.sum(F.col("n") * F.col("w") * F.col("w"))
        .cast("long")
        .alias("snww"),
    )
    agg = agg.where(
        (F.col("n_years") > 1)
        & (F.col("xx") > 0)
        & (F.col("xx") < F.col("nn"))
    )
    nn = F.col("nn").cast("double")
    xx = F.col("xx").cast("double")
    pbar = xx / nn
    num = F.col("sxw").cast("double") - pbar * F.col("snw").cast("double")
    var = (
        pbar
        * (F.lit(1.0) - pbar)
        * (
            F.col("snww").cast("double")
            - (
                F.col("snw").cast("double")
                * F.col("snw").cast("double")
            )
            / nn
        )
    )
    return agg.select(
        "n_years",
        F.col("nn").alias("n_orders"),
        pbar.alias("urgent_share"),
        (num / F.sqrt(var)).alias("ca_z"),
    )


SQL_PRIORITY_TREND_SQL = """
WITH yr AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END AS BIGINT) AS is_urgent
  FROM orders
),
y0 AS (SELECT MIN(y) AS y0 FROM yr),
per_year AS (
  SELECT yr.y - y0.y0 AS w,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(is_urgent) AS BIGINT) AS x
  FROM yr CROSS JOIN y0
  GROUP BY yr.y - y0.y0
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_years,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(x) AS BIGINT) AS xx,
         CAST(SUM(x * w) AS BIGINT) AS sxw,
         CAST(SUM(n * w) AS BIGINT) AS snw,
         CAST(SUM(n * w * w) AS BIGINT) AS snww
  FROM per_year
)
SELECT n_years, nn AS n_orders,
       CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) AS urgent_share,
       (CAST(sxw AS DOUBLE)
        - (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))
          * CAST(snw AS DOUBLE))
         / sqrt((CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))
                * (1.0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))
                * (CAST(snww AS DOUBLE)
                   - (CAST(snw AS DOUBLE) * CAST(snw AS DOUBLE))
                     / CAST(nn AS DOUBLE))) AS ca_z
FROM agg
WHERE n_years > 1 AND xx > 0 AND xx < nn
"""


# ---------------------------------------- circular stats / Rayleigh

_QCOS24 = (
    1024, 989, 887, 724, 512, 265, 0, -265, -512, -724, -887, -989,
    -1024, -989, -887, -724, -512, -265, 0, 265, 512, 724, 887, 989,
)
_QSIN24 = (
    0, 265, 512, 724, 887, 989, 1024, 989, 887, 724, 512, 265,
    0, -265, -512, -724, -887, -989, -1024, -989, -887, -724, -512, -265,
)


def events_circular_rayleigh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIRCULAR concentration of event times around the 24-hour clock,
    per type: the mean resultant length R-bar and the RAYLEIGH test
    statistic z = n * R-bar^2 ("is this type's traffic diurnal or
    uniform?") plus the integer modal hour — the circular-statistics
    screen linear moments cannot express (23:00 and 01:00 average to
    midnight, not noon).

    Exactness: hour angles take only 24 values, so cos/sin enter as
    PRE-QUANTIZED 2^10-grid integer tables embedded as literals in
    BOTH engines (the events_dominant_period trick — no runtime trig);
    the resultant components are int64 sums, R-bar needs one sqrt over
    identically-cast doubles, and the modal hour is integer argmax
    (ties to the earliest hour). Scale: one data-sized (type, hour)
    hash agg; everything after is a 24-row frame per type."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("h")
    )
    hourly = e.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("long").alias("n_h")
    )
    qcos = F.element_at(
        F.array(*[F.lit(v) for v in _QCOS24]), F.col("h") + 1
    ).cast("long")
    qsin = F.element_at(
        F.array(*[F.lit(v) for v in _QSIN24]), F.col("h") + 1
    ).cast("long")
    agg = hourly.select(
        "event_type",
        "h",
        "n_h",
        (F.col("n_h") * qcos).alias("c"),
        (F.col("n_h") * qsin).alias("s"),
    ).groupBy("event_type").agg(
        F.sum("n_h").cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum("s").cast("long").alias("ss"),
        F.max(F.struct(F.col("n_h"), (-F.col("h")).alias("nh")))
        .getField("nh")
        .alias("neg_modal"),
    )
    rbar = F.sqrt(
        (
            F.col("sc").cast("double") * F.col("sc").cast("double")
            + F.col("ss").cast("double") * F.col("ss").cast("double")
        )
    ) / (F.lit(1024.0) * F.col("n").cast("double"))
    return agg.select(
        "event_type",
        F.col("n").alias("n_events"),
        (-F.col("neg_modal")).cast("long").alias("modal_hour"),
        rbar.alias("rbar"),
        (F.col("n").cast("double") * rbar * rbar).alias("rayleigh_z"),
    ).orderBy("event_type")


def _events_circular_rayleigh_sql() -> str:
    cos_cases = " ".join(
        f"WHEN {h} THEN {v}" for h, v in enumerate(_QCOS24)
    )
    sin_cases = " ".join(
        f"WHEN {h} THEN {v}" for h, v in enumerate(_QSIN24)
    )
    return f"""
WITH hourly AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS h,
         CAST(COUNT(*) AS BIGINT) AS n_h
  FROM events GROUP BY event_type, CAST(hour(ts) AS INT)
),
marked AS (
  SELECT *, MAX(n_h) OVER (PARTITION BY event_type) AS mh
  FROM hourly
),
agg AS (
  SELECT event_type,
         CAST(SUM(n_h) AS BIGINT) AS n,
         CAST(SUM(n_h * (CASE h {cos_cases} END)) AS BIGINT) AS sc,
         CAST(SUM(n_h * (CASE h {sin_cases} END)) AS BIGINT) AS ss,
         CAST(MIN(h) FILTER (WHERE n_h = mh) AS BIGINT) AS modal_hour
  FROM marked GROUP BY event_type
)
SELECT event_type, n AS n_events, modal_hour,
       sqrt(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
            + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
         / (1024.0 * CAST(n AS DOUBLE)) AS rbar,
       CAST(n AS DOUBLE)
         * (sqrt(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                 + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
            / (1024.0 * CAST(n AS DOUBLE)))
         * (sqrt(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                 + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
            / (1024.0 * CAST(n AS DOUBLE))) AS rayleigh_z
FROM agg
ORDER BY event_type
"""


# --------------------------------------------------- tenant load gini


def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI concentration of event volume across users, per type — the
    full tenant-load-inequality index next to
    events_user_concentration's top-k shares ("is this type's traffic
    one noisy neighbor or genuinely broad?"). Reuses the exact-integer
    gini operator (operators/stats.gini) on per-user event counts
    scaled x100 onto its cents grid, so total_value reads back as the
    exact event count. Scale: one data-sized hash agg to the (type,
    user) frame; the ranking window is user-dimension bounded."""
    from ..operators import stats as ST

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("event_type", "user_id").agg(
        (F.count(F.lit(1)) * 100).cast("long").alias("cnt_cents")
    )
    return ST.gini(
        per_user, "event_type", "user_id", "cnt_cents"
    ).withColumnRenamed("total_value", "n_events")


def _events_user_gini_sql() -> str:
    from ..operators.stats import gini_sql

    src = (
        "SELECT event_type, user_id,"
        " CAST(COUNT(*) * 100 AS BIGINT) AS cnt_cents"
        " FROM events GROUP BY event_type, user_id"
    )
    return gini_sql(src, "event_type", "user_id", "cnt_cents").replace(
        "AS total_value", "AS n_events"
    )


# ------------------------------------------------ anomaly ensemble


def events_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANOMALY-DETECTOR ENSEMBLE on daily arrival counts per type: the
    per-type agreement summary of three independent detectors — the
    Shewhart 3-sigma gate (events_spc_control's integer decision), the
    median/MAD robust gate (events_robust_outliers' 4.4478 factor),
    and an EWMA-baseline shift gate (the stream_ewma_alert prefix
    recipe, alpha = 1/8, first-day seeded) — with the consensus count
    (days flagged by >= 2 detectors). This is the reference's OWN
    domain (AD.java:200 hardcodes one threshold) upgraded to the
    ensemble an SRE dashboard actually pages on: single-detector flags
    are noise candidates, consensus flags are incidents.

    Exactness: SPC is pure integer algebra ((n*x - S)^2 > 9*(nQ -
    S^2)); the robust gate compares against quantile-selected
    median/MAD (selection parity pinned by sql_price_quantiles) with
    one product; the EWMA prefix folds run the IDENTICAL IEEE sequence
    both engines (exact binary alpha, init-first list fold) and the
    shift compare uses identically-composed 3*sd. Scale: ONE
    data-sized hash agg to (type, day); every detector then works the
    calendar-bounded day frame (the EWMA prefix is O(days^2) on that
    bounded list — the events_cusum cost contract)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
        F.expr("percentile(x, 0.5)").alias("med"),
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("arr"),
    )
    mad = (
        daily.join(
            F.broadcast(stats.select("event_type", "med")), "event_type"
        )
        .select(
            "event_type", F.abs(F.col("x") - F.col("med")).alias("adev")
        )
        .groupBy("event_type")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    )
    j = stats.join(F.broadcast(mad), "event_type").where(
        (F.col("n") > 1)
        & (F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0)
    )
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    sd = F.sqrt(var_n2.cast("double")) / F.col("n").cast("double")
    xs = F.transform(F.col("arr"), lambda p: p["x"].cast("double"))
    # per-position votes; i is 0-based inside transform
    fold = lambda acc, v: acc * F.lit(0.875) + v * F.lit(0.125)  # noqa: E731
    votes = F.transform(
        F.col("arr"),
        lambda p, i: (
            # SPC: integer 3-sigma decision
            F.when(
                (F.col("n") * p["x"] - F.col("s"))
                * (F.col("n") * p["x"] - F.col("s"))
                > F.lit(9) * var_n2,
                1,
            ).otherwise(0)
            # robust: |x - med| > 4.4478 * MAD
            + F.when(
                F.abs(p["x"].cast("double") - F.col("med"))
                > F.col("mad") * F.lit(4.4478),
                1,
            ).otherwise(0)
            # EWMA shift: |x_i - prefix-ewma| > 3 * sd, days 2..n only
            + F.when(
                (i >= 1)
                & (
                    F.abs(
                        p["x"].cast("double")
                        - F.aggregate(
                            F.slice(xs, 2, F.greatest(F.lit(0), i - 1)),
                            F.element_at(xs, 1),
                            fold,
                        )
                    )
                    > F.lit(3.0) * sd
                ),
                1,
            ).otherwise(0)
        ).cast("long"),
    )
    agg = j.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.aggregate(
            votes,
            F.lit(0).cast("long"),
            lambda a, v: a + F.when(v >= 1, 1).otherwise(0),
        ).alias("flagged_any"),
        F.aggregate(
            votes,
            F.lit(0).cast("long"),
            lambda a, v: a + F.when(v >= 2, 1).otherwise(0),
        ).alias("flagged_consensus"),
        F.aggregate(
            votes, F.lit(0).cast("long"), lambda a, v: F.greatest(a, v)
        ).alias("max_votes"),
    )
    return agg.orderBy("event_type")


EVENTS_ANOMALY_ENSEMBLE_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS q,
         quantile_cont(x, 0.5) AS med,
         list(CAST(x AS DOUBLE) ORDER BY d) AS xs,
         list(x ORDER BY d) AS xi
  FROM daily GROUP BY event_type
),
md AS (
  SELECT daily.event_type,
         quantile_cont(abs(daily.x - st.med), 0.5) AS mad
  FROM daily JOIN st ON st.event_type = daily.event_type
  GROUP BY daily.event_type
),
votes AS (
  SELECT st.event_type, st.n,
         list_transform(generate_series(1, CAST(st.n AS INTEGER)), i ->
           CAST(CASE WHEN (st.n * xi[i] - st.s) * (st.n * xi[i] - st.s)
                          > 9 * (st.n * st.q - st.s * st.s)
                     THEN 1 ELSE 0 END
              + CASE WHEN abs(CAST(xi[i] AS DOUBLE) - st.med)
                          > md.mad * 4.4478
                     THEN 1 ELSE 0 END
              + CASE WHEN i >= 2 AND
                          abs(CAST(xi[i] AS DOUBLE)
                              - list_reduce(
                                  list_prepend(xs[1],
                                    list_slice(xs, 2, i - 1)),
                                  (acc, v) -> acc * 0.875 + v * 0.125))
                          > 3.0 * (sqrt(CAST(st.n * st.q - st.s * st.s
                                             AS DOUBLE))
                                   / CAST(st.n AS DOUBLE))
                     THEN 1 ELSE 0 END AS BIGINT)) AS v
  FROM st JOIN md ON md.event_type = st.event_type
  WHERE st.n > 1 AND st.n * st.q - st.s * st.s > 0
)
SELECT event_type, n AS n_days,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(v, t -> CASE WHEN t >= 1
                                     THEN CAST(1 AS BIGINT)
                                     ELSE CAST(0 AS BIGINT) END)),
         (a, b) -> a + b) AS flagged_any,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(v, t -> CASE WHEN t >= 2
                                     THEN CAST(1 AS BIGINT)
                                     ELSE CAST(0 AS BIGINT) END)),
         (a, b) -> a + b) AS flagged_consensus,
       list_reduce(list_prepend(CAST(0 AS BIGINT), v),
         (a, b) -> GREATEST(a, b)) AS max_votes
FROM votes
ORDER BY event_type
"""


# -------------------------------------------- acctbal/spend Pearson


def sql_acctbal_spend_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEARSON correlation between a customer's account balance and
    their total order spend, per market segment — the CRM sanity
    check ("does the balance field carry any signal about actual
    spend?") behind segment-level credit policies.

    Exactness: balances and spend quantize to WHOLE DOLLARS (the
    operator's documented grid — cents squared overflow int64 sums on
    big segments; dollars keep sum-of-squares exact through ~sf100,
    and r is grid-invariant up to the shared quantization); all
    five sufficient statistics are int64 hash-agg sums; r composes
    once as (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy -
    Sy^2)) over identically-cast doubles (int64 cross products stay
    exact in double through the customer dimension; the series-
    similarity recipe), with a structural zero-variance guard. Scale:
    orders collapse to the customer dimension in one hash agg; the
    stats agg is segment-keyed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("y")
    )
    j = c.select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") + F.lit(0.5))
        .cast("long")
        .alias("x"),
    ).join(spend, F.col("c_custkey") == spend.o_custkey)
    agg = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    vx = F.col("n").cast("double") * F.col("sxx").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sx").cast("double")
    vy = F.col("n").cast("double") * F.col("syy").cast("double") - F.col(
        "sy"
    ).cast("double") * F.col("sy").cast("double")
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    return (
        agg.where((vx > 0) & (vy > 0))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("n").alias("n_customers"),
            (num / (F.sqrt(vx) * F.sqrt(vy))).alias("pearson_r"),
        )
        .orderBy("segment")
    )


SQL_ACCTBAL_SPEND_CORR_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_mktsegment,
         CAST(FLOOR(c.c_acctbal + 0.5) AS BIGINT) AS x,
         s.y
  FROM customer c JOIN spend s ON s.o_custkey = c.c_custkey
),
agg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM j GROUP BY c_mktsegment
)
SELECT c_mktsegment AS segment, n AS n_customers,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS pearson_r
FROM agg
WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
  AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
ORDER BY segment
"""


# ------------------------------------------- dimension balance DQ


def dq_segment_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMENSION-BALANCE audit: chi-square of independence between
    market segment and nation over the customer dimension — the
    sampling-balance screen ("is any nation's segment mix skewed?") a
    warehouse runs after a partial load or a biased upstream extract.

    Exactness: the events_chi2_independence recipe on the customer
    dim — exact int64 cell/marginal counts, each cell term
    (O*N - rt*ct)^2 / (rt*ct*N) quantized onto the 2^-20 grid before
    the int64 fold, one final division (the O*N cross product stays
    int64-exact through ~3e9 customers — documented bound). Scale:
    one dimension-sized hash agg; the cell frame is
    |segments| x |nations|."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nk"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    cells = cells.localCheckpoint(eager=True)
    rt = cells.groupBy("seg").agg(F.sum("o").cast("long").alias("rt"))
    ct = cells.groupBy("nk").agg(F.sum("o").cast("long").alias("ct"))
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    dims = cells.agg(
        F.countDistinct("seg").cast("long").alias("r"),
        F.countDistinct("nk").cast("long").alias("c"),
    )
    q20 = float(1 << 20)
    dev = (
        F.col("o") * F.col("n") - F.col("rt") * F.col("ct")
    ).cast("double")
    term = F.floor(
        (dev * dev)
        / (
            (F.col("rt") * F.col("ct")).cast("double")
            * F.col("n").cast("double")
        )
        * F.lit(q20)
        + F.lit(0.5)
    ).cast("long")
    summed = (
        cells.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "nk")
        .crossJoin(F.broadcast(n))
        .select(term.alias("t"), "n")
        .groupBy("n")
        .agg(F.sum("t").cast("long").alias("sq"))
    )
    return summed.crossJoin(F.broadcast(dims)).select(
        F.col("n").alias("n_customers"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("df"),
        (F.col("sq").cast("double") / F.lit(q20)).alias("chi2"),
    )


def _dq_segment_balance_sql() -> str:
    q20 = float(1 << 20)
    return f"""
WITH cells AS MATERIALIZED (
  SELECT c_mktsegment AS seg, c_nationkey AS nk,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer GROUP BY c_mktsegment, c_nationkey
),
rt AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY seg),
ct AS (SELECT nk, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY nk),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
dims AS (SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS r,
                CAST(COUNT(DISTINCT nk) AS BIGINT) AS c FROM cells),
summed AS (
  SELECT n.n,
         CAST(SUM(CAST(FLOOR(
             (CAST(cells.o * n.n - rt.rt * ct.ct AS DOUBLE)
              * CAST(cells.o * n.n - rt.rt * ct.ct AS DOUBLE))
             / (CAST(rt.rt * ct.ct AS DOUBLE) * CAST(n.n AS DOUBLE))
             * {q20!r} + 0.5) AS BIGINT)) AS BIGINT) AS sq
  FROM cells JOIN rt ON rt.seg = cells.seg JOIN ct ON ct.nk = cells.nk
  CROSS JOIN n
  GROUP BY n.n
)
SELECT summed.n AS n_customers,
       (dims.r - 1) * (dims.c - 1) AS df,
       CAST(sq AS DOUBLE) / {q20!r} AS chi2
FROM summed CROSS JOIN dims
"""


QUERIES = {
    "simsearch_ivf_recall_curve": simsearch_ivf_recall_curve,
    "corpus_dedup_token_loss": corpus_dedup_token_loss,
    "dq_id_continuity": dq_id_continuity,
    "sql_priority_trend": sql_priority_trend,
    "events_circular_rayleigh": events_circular_rayleigh,
    "events_user_gini": events_user_gini,
    "events_anomaly_ensemble": events_anomaly_ensemble,
    "sql_acctbal_spend_corr": sql_acctbal_spend_corr,
    "dq_segment_balance": dq_segment_balance,
}

ORACLES = {
    "simsearch_ivf_recall_curve": _simsearch_ivf_recall_curve_sql(),
    "corpus_dedup_token_loss": CORPUS_DEDUP_TOKEN_LOSS_SQL,
    "dq_id_continuity": DQ_ID_CONTINUITY_SQL,
    "sql_priority_trend": SQL_PRIORITY_TREND_SQL,
    "events_circular_rayleigh": _events_circular_rayleigh_sql(),
    "events_user_gini": _events_user_gini_sql(),
    "events_anomaly_ensemble": EVENTS_ANOMALY_ENSEMBLE_SQL,
    "sql_acctbal_spend_corr": SQL_ACCTBAL_SPEND_CORR_SQL,
    "dq_segment_balance": _dq_segment_balance_sql(),
}
