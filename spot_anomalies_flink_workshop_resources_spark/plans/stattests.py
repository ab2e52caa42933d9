"""Round-6 analytics surface: hypothesis tests, concentration and
association mining, HITS centrality, and corpus novelty scoring.

Each query follows the repo's oracle contract — scalar-only result
columns, aliases identical on both sides, exactness via integer
sufficient statistics (see operators/stats.py's module docstring for
the strategy). Reference scope note: the reference's analytics end at
fixed-threshold detection (AD.java:200); this module is the
beyond-reference statistical layer a platform user runs on the same
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import stats as ST

# ---------------------------------------------------------------- stats


def events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U of each event type's value distribution vs the
    rest pooled (operators/stats.mannwhitney): exact midrank rank-sums
    on the cents grid, tie-corrected z."""
    return ST.mannwhitney(load_table(spark, sf_dir, "events"))


def events_ks_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS between click and purchase value distributions
    (operators/stats.ks_2samp): the sup|F_a - F_b| selected by integer
    cross-multiplication, argmax location included."""
    return ST.ks_2samp(load_table(spark, sf_dir, "events"), "click", "purchase")


def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence of event_type x hour-of-day
    (operators/stats.chi2_independence): grid-quantized cell terms,
    exact int64 fold."""
    return ST.chi2_independence(load_table(spark, sf_dir, "events"))


def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type on the above/below-
    median value sequence (operators/stats.runs_test)."""
    return ST.runs_test(load_table(spark, sf_dir, "events"))


# ------------------------------------------------------ concentration

GINI_SOURCE_SQL = """
SELECT n.n_name, c.c_custkey,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name, c.c_custkey
"""


def sql_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of order revenue across customers per nation
    (operators/stats.gini): integer rank-weighted sums, one final
    division. Customers without orders are out of scope (inner join —
    the 'revenue concentration among buyers' reading)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    src = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("rev_cents")
        )
    )
    return ST.gini(src, "n_name", "c_custkey", "rev_cents").withColumnRenamed(
        "n_name", "nation"
    )


SQL_GINI_REVENUE_SQL = (
    ST.gini_sql(GINI_SOURCE_SQL, "n_name", "c_custkey", "rev_cents")
    # rename only the FINAL projection's group column (the CTE-internal
    # "SELECT n_name, rev_cents" lines must keep the raw name)
    .replace(
        "SELECT n_name, n AS n_members",
        "SELECT n_name AS nation, n AS n_members",
    )
)


def sql_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by lineitem revenue:
    cumulative-share classes A (<=80%), B (<=95%), C (rest), with
    class boundaries decided by INTEGER cross-multiplication on exact
    cents (cum*100 <= total*80 — no float share ever compared). The
    ranking window runs over the part-dimension frame (|parts|-sized,
    not data-sized). Per-line revenue quantizes the double product
    ext*(1-disc) once, identically on both engines."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(cents).cast("long").alias("rev")
    )
    w = (
        Window.orderBy(F.desc("rev"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per_part.agg(F.sum("rev").cast("long").alias("total"))
    classed = (
        per_part.withColumn("cum", F.sum("rev").over(w).cast("long"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
            .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
            .otherwise("C"),
        )
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        (F.sum("rev").cast("double") / F.lit(100.0)).alias("class_revenue"),
        (
            F.sum("rev").cast("double")
            / F.max("total").cast("double")
        ).alias("revenue_share"),
    )


SQL_PARETO_ABC_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM per_part),
classed AS (
  SELECT p.rev,
         CASE WHEN CAST(SUM(p.rev) OVER (ORDER BY p.rev DESC, p.l_partkey)
                        AS BIGINT) * 100 <= t.total * 80 THEN 'A'
              WHEN CAST(SUM(p.rev) OVER (ORDER BY p.rev DESC, p.l_partkey)
                        AS BIGINT) * 100 <= t.total * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         t.total
  FROM per_part p CROSS JOIN tot t
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) / 100.0 AS class_revenue,
       CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
         AS revenue_share
FROM classed
GROUP BY abc_class
"""


# ------------------------------------------------------------- graph

TRANSITION_EDGES_CTE = """WITH edges AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
    SELECT LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS src,
           event_type AS dst
    FROM events
  ) WHERE src IS NOT NULL
  GROUP BY src, dst
)"""


def events_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the event-type transition graph
    (operators/graph.hits) — which types originate activity vs
    receive it. Same edge builder as events_pagerank; 5 integer-exact
    rounds, oracle unrolls the same."""
    from pyspark.sql import Window

    from ..operators.graph import hits

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return hits(edges, iters=5)


def _events_hits_sql() -> str:
    from ..operators.graph import HSCALE, hits_ctes

    return f"""
{hits_ctes(TRANSITION_EDGES_CTE, iters=5)}
SELECT a.node,
       CAST(a.a AS DOUBLE) / {float(HSCALE)!r} AS authority,
       CAST(h.h AS DOUBLE) / {float(HSCALE)!r} AS hub
FROM a5 a JOIN h5 h ON h.node = a.node
"""


# ------------------------------------------------------- association


def events_itemsets3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-3 frequent itemsets over (user, day) baskets — the apriori
    step above events_copair_support. All-integer supports; the triple
    join runs on the per-basket distinct item list (items per basket
    bounded by |event types|, so candidate fan-out is capped at
    C(|T|,3) per basket, not data-squared)."""
    e = load_table(spark, sf_dir, "events")
    items = e.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("event_type").alias("t"),
    ).distinct()
    nb = items.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    a = items.select("user_id", "day", F.col("t").alias("ta"))
    b = items.select("user_id", "day", F.col("t").alias("tb"))
    c = items.select("user_id", "day", F.col("t").alias("tc"))
    triples = (
        a.join(b, ["user_id", "day"])
        .where(F.col("ta") < F.col("tb"))
        .join(c, ["user_id", "day"])
        .where(F.col("tb") < F.col("tc"))
        .groupBy("ta", "tb", "tc")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return triples.crossJoin(F.broadcast(nb)).select(
        "ta",
        "tb",
        "tc",
        "support",
        (
            F.col("support").cast("double")
            / F.col("n_baskets").cast("double")
        ).alias("support_ratio"),
    )


EVENTS_ITEMSETS3_SQL = """
WITH items AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type AS t
  FROM events
),
nb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
  FROM (SELECT DISTINCT user_id, day FROM items)
),
triples AS (
  SELECT a.t AS ta, b.t AS tb, c.t AS tc,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM items a
  JOIN items b ON a.user_id = b.user_id AND a.day = b.day AND a.t < b.t
  JOIN items c ON b.user_id = c.user_id AND b.day = c.day AND b.t < c.t
  GROUP BY a.t, b.t, c.t
)
SELECT ta, tb, tc, support,
       CAST(support AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE)
         AS support_ratio
FROM triples CROSS JOIN nb
"""


# ----------------------------------------------------------- novelty


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram novelty of each document against a reference slice
    (doc_id % 10 == 0) — the 'how much of this is new text?' signal a
    dataset-curation pass uses to prioritize fresh content (and its
    complement is memorization risk). Distinct bigrams per doc, anti-
    joined against the reference's distinct bigram vocabulary; exact
    integer counts, one final ratio. At scale both sides are hash
    joins on the bigram key — no broadcast assumption on the
    reference vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.expr(
        "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
    )
    # the size >= 2 filter below guarantees an ascending sequence
    # (sequence(1, 0) would DESCEND in Spark)
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    db = (
        d.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .distinct()
    )
    ref = (
        db.where(F.col("doc_id") % 10 == 0).select("bg").distinct()
        .withColumn("in_ref", F.lit(1))
    )
    return (
        db.join(ref, "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("in_ref").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_novel",
            (
                F.col("n_novel").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("novelty"),
        )
    )


TEXT_NGRAM_NOVELTY_SQL = """
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
db AS (
  SELECT DISTINCT doc_id, bg
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bg
    FROM tk WHERE len(toks) >= 2
  )
),
ref AS (SELECT DISTINCT bg FROM db WHERE doc_id % 10 = 0)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN r.bg IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN r.bg IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM db d LEFT JOIN ref r ON r.bg = d.bg
GROUP BY d.doc_id
"""


QUERIES = {
    "events_mannwhitney": events_mannwhitney,
    "events_ks_2samp": events_ks_2samp,
    "events_chi2_independence": events_chi2_independence,
    "events_runs_test": events_runs_test,
    "sql_gini_revenue": sql_gini_revenue,
    "sql_pareto_abc": sql_pareto_abc,
    "events_hits": events_hits,
    "events_itemsets3": events_itemsets3,
    "text_ngram_novelty": text_ngram_novelty,
}

ORACLES = {
    "events_mannwhitney": ST.MANNWHITNEY_SQL,
    "events_ks_2samp": ST.ks_2samp_sql("click", "purchase"),
    "events_chi2_independence": ST.CHI2_INDEPENDENCE_SQL,
    "events_runs_test": ST.RUNS_TEST_SQL,
    "sql_gini_revenue": SQL_GINI_REVENUE_SQL,
    "sql_pareto_abc": SQL_PARETO_ABC_SQL,
    "events_hits": _events_hits_sql(),
    "events_itemsets3": EVENTS_ITEMSETS3_SQL,
    "text_ngram_novelty": TEXT_NGRAM_NOVELTY_SQL,
}
