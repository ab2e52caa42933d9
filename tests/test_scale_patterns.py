"""Scale-pattern proofs: bucketed co-located joins (no shuffle) and
salted aggregation equivalence — the knobs SCALE.md claims for 1000x."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.catalog import load_table
from spot_anomalies_flink_workshop_resources_spark.operators.skew import salted_agg


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path_factory):
    """bucketBy(orderkey) on both sides of the orders⨝lineitem spine
    removes the join exchange entirely (SCALE.md knob #1)."""
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{wh}'")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bucketdemo.orders_b")
    )
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bucketdemo.lineitem_b")
    )
    ob = spark.table("bucketdemo.orders_b")
    lb = spark.table("bucketdemo.lineitem_b")
    # disable auto-broadcast: at real scale neither side broadcasts, and
    # the point is that bucketing replaces the shuffle a SMJ would need
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not introduce a shuffle between the scans
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        n_exchanges = plan.count("Exchange hashpartitioning")
        # only the final groupBy may shuffle (1); unbucketed needs 3
        assert n_exchanges <= 1, f"expected no join exchanges:\n{plan}"
        assert "Bucketed: true" in plan
        result = sorted(map(tuple, joined.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # sanity: same result as the unbucketed join
    plain = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert result == sorted(map(tuple, plain.collect()))


def test_salted_agg_equals_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("value").alias("mx"),
    )
    salted = salted_agg(
        e,
        ["event_type"],
        {
            "n": (F.count(F.lit(1)), F.sum("n").cast("long")),
            "mx": (F.max("value"), F.max("mx")),
        },
        num_salts=8,
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
