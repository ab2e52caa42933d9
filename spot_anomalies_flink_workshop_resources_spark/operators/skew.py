"""Skew-resilient aggregation: two-phase (salted) groupBy.

For a heavily skewed grouping key, a single hash aggregation sends every
row of the hot key to one reducer. The classic fix: salt the key with a
random shard id, pre-aggregate (key, salt), then aggregate the partials
by key. Results are identical to the plain aggregation for any
decomposable aggregate (sum/count/min/max); the harness checks the
salted rollup against the SAME DuckDB oracle as the unsalted one.

Spark note: map-side partial aggregation already gives this benefit for
sum/count when partials combine well; explicit salting still matters
when the partial layer is defeated (high-cardinality secondary keys,
distinct-style aggregates, or a first shuffle that must balance).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    num_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation.

    ``aggs`` maps output column name -> (partial_agg_expr, final_agg_expr)
    where the partial runs over raw rows within (group, salt) and the
    final recombines partials per group, e.g.::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),  F.sum("n")),
            "s":   (F.sum("v"),         F.sum("s")),
            "mx":  (F.max("v"),         F.max("mx")),
        })
    """
    salted = df.withColumn("_salt", (F.rand(seed) * num_salts).cast("int"))
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def table_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """ANALYZE-style column statistics: one row per profiled column with
    null count, exact distinct count, and min/max (rendered as strings
    so heterogeneous column types share a schema) — the stats a
    cost-based optimizer and a file-skipping layout decision consume.

    Plan shape: ONE aggregation pass computes every column's
    count/min/max partials map-side; the exact distinct counts add one
    expand+shuffle (the price of exactness — swap in approx_count_
    distinct for the sketch path at extreme widths). The per-column
    rows are built driver-side from the single 1-row aggregate."""
    aggs = []
    for c in cols:
        # aggregate on the NATIVE type, cast the result: casting first
        # would make numeric min/max lexicographic (min of {9,10} = '10')
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__ndv"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (
            c,
            int(row[f"{c}__nulls"]),
            int(row[f"{c}__ndv"]),
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "col_name string, n_nulls long, n_distinct long, "
        "min_str string, max_str string",
    )


def table_profile_sql(table: str, cols: Sequence[str]) -> str:
    parts = [
        f"""
SELECT '{c}' AS col_name,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_str,
       CAST(MAX({c}) AS VARCHAR) AS max_str
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def skew_profile(
    df: DataFrame, key_cols: Sequence[str], top_k: int = 10
) -> DataFrame:
    """Heavy-hitter profile of a grouping key: the diagnostic a pipeline
    runs BEFORE choosing between plain, salted, or split execution for
    a key (the telemetry twin of ``salted_agg`` and the skew-split
    detector).

    Output: one row per top-k key by row count — rank, the key rendered
    as a string, its count, share of all rows, cumulative share, plus
    the constant n_keys/n_rows context columns.

    Plan shape: one hash agg on the key (the thing being profiled —
    unavoidable and exactly as skewed as the key itself, but count
    partials combine map-side so the reducer sees one partial per
    upstream partition, not the raw rows), a TakeOrdered top-k (no
    global sort shuffle), a tiny totals aggregate broadcast in, and a
    cum-share window over the k collected rows only.
    """
    # NULL key columns render as '<null>' on BOTH engines: concat_ws
    # silently maps NULL to '' in Spark while DuckDB's || propagates
    # NULL — coalescing first keeps the grouping identical (ADVICE r3)
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
            for c in key_cols
        ],
    )
    counts = (
        df.select(key.alias("key_value"))
        .groupBy("key_value")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n_rows").cast("long").alias("total_rows"),
    )
    top = (
        counts.orderBy(F.col("n_rows").desc(), F.col("key_value").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col("n_rows").desc(), F.col("key_value").asc())
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    share = F.col("n_rows").cast("double") / F.col("total_rows")
    return top.select(
        F.row_number().over(w_rank).cast("long").alias("rank"),
        "key_value",
        "n_rows",
        share.alias("share"),
        (F.sum("n_rows").over(w_cum).cast("double") / F.col("total_rows")).alias(
            "cum_share"
        ),
        "n_keys",
        "total_rows",
    )


def skew_profile_sql(
    table: str, key_cols: Sequence[str], top_k: int = 10
) -> str:
    key = " || '|' || ".join(
        f"COALESCE(CAST({c} AS VARCHAR), '<null>')" for c in key_cols
    )
    return f"""
WITH counts AS (
  SELECT {key} AS key_value, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM {table} GROUP BY 1
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n_rows) AS BIGINT) AS total_rows
  FROM counts
),
top AS (
  SELECT key_value, n_rows FROM counts
  ORDER BY n_rows DESC, key_value LIMIT {top_k}
)
SELECT CAST(ROW_NUMBER() OVER o AS BIGINT) AS rank,
       key_value, n_rows,
       CAST(n_rows AS DOUBLE) / total_rows AS share,
       CAST(SUM(n_rows) OVER (o ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / total_rows AS cum_share,
       n_keys, total_rows
FROM top, totals
WINDOW o AS (ORDER BY n_rows DESC, key_value)
"""
