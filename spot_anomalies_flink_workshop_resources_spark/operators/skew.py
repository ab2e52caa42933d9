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
