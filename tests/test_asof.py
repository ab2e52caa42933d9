"""As-of join semantics: prior-match, exact-timestamp tie, null when no
prior, key isolation. Plus approximate-aggregate accuracy bounds."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.operators.asof import asof_join


def _t(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(id=1, k="a", ts=_t(10)),
            Row(id=2, k="a", ts=_t(20)),
            Row(id=3, k="a", ts=_t(5)),  # before any right row
            Row(id=4, k="b", ts=_t(100)),  # other key: must not see k='a'
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=_t(8), price=1.0),
            Row(k="a", rts=_t(10), price=2.0),  # exact tie with left id=1
            Row(k="a", rts=_t(15), price=3.0),
        ]
    )
    out = {
        r.id: r.asof_price
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            value_cols=["price"],
        ).collect()
    }
    assert out[1] == 2.0  # tie at equal ts matches (ASOF <=)
    assert out[2] == 3.0  # latest prior
    assert out[3] is None  # nothing at or before t=5
    assert out[4] is None  # key isolation


def test_asof_join_preserves_left_rows_and_columns(spark):
    left = spark.createDataFrame([Row(id=1, k="a", ts=_t(1), extra="x")])
    right = spark.createDataFrame([Row(k="a", rts=_t(0), price=9.0)])
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["price"]
    )
    assert set(out.columns) == {"id", "k", "ts", "extra", "asof_price"}
    row = out.collect()[0]
    assert row.extra == "x" and row.asof_price == 9.0


def test_approx_count_distinct_accuracy(spark, sf_dir):
    from spot_anomalies_flink_workshop_resources_spark.catalog import load_table

    l = load_table(spark, sf_dir, "lineitem")
    rows = (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.1  # HLL default ~2% rsd


def test_asof_duplicate_right_ts_deterministic(spark):
    """Right rows sharing (key, ts): the greatest right_order value wins,
    deterministically (regression: window ordered only by (_t, _side)
    let last() pick an arbitrary duplicate)."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    right = spark.createDataFrame(
        [("u1", t, 100.0, 1), ("u1", t, 999.0, 2), ("u1", t, 500.0, 0)],
        "user string, ts timestamp, purchase_value double, seq int",
    )
    left = spark.createDataFrame(
        [("u1", t + dt.timedelta(seconds=5))], "user string, ts timestamp"
    )
    for _ in range(3):
        out = asof_join(
            left, right, key="user", left_ts="ts", right_ts="ts",
            value_cols=["purchase_value"], right_order="seq",
        ).collect()
        assert out[0].asof_purchase_value == 999.0  # seq=2 wins
    # default tiebreaker: greatest value-struct → 999.0 as well
    out = asof_join(
        left, right, key="user", left_ts="ts", right_ts="ts",
        value_cols=["purchase_value"],
    ).collect()
    assert out[0].asof_purchase_value == 999.0


def test_interval_join_bucketed_equals_naive_and_bounds(spark):
    """Bucketized interval join == naive theta-join on random data, and
    inclusive bounds hold exactly at the window edges and across bucket
    boundaries."""
    import random

    from spot_anomalies_flink_workshop_resources_spark.operators.asof import (
        interval_join_bucketed,
    )

    t0 = dt.datetime(2024, 1, 1)
    rng = random.Random(11)
    lrows = [
        (f"u{rng.randint(0, 5)}", i, t0 + dt.timedelta(seconds=rng.randint(0, 7200)))
        for i in range(120)
    ]
    rrows = [
        (f"u{rng.randint(0, 5)}", 1000 + i,
         t0 + dt.timedelta(seconds=rng.randint(0, 7200)), float(i))
        for i in range(150)
    ]
    # exact edge cases: right at left_ts (lower bound, inclusive), right
    # at left_ts + upper (upper bound, inclusive), right 1s past it, and
    # a pair whose window straddles a bucket boundary
    edge_l = t0 + dt.timedelta(seconds=3000)
    lrows += [("edge", 500, edge_l)]
    rrows += [
        ("edge", 2000, edge_l, 1.0),
        ("edge", 2001, edge_l + dt.timedelta(seconds=900), 2.0),
        ("edge", 2002, edge_l + dt.timedelta(seconds=901), 3.0),
    ]
    left = spark.createDataFrame(lrows, "user_id string, click_id long, click_ts timestamp")
    right = spark.createDataFrame(
        rrows, "user_id string, purchase_id long, purchase_ts timestamp, v double"
    )

    def key_set(df):
        return {(r.click_id, r.purchase_id) for r in df.collect()}

    naive = left.alias("a").join(
        right.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.purchase_ts") >= F.col("a.click_ts"))
        & (F.col("b.purchase_ts") <= F.col("a.click_ts") + F.expr("INTERVAL 900 SECONDS")),
    ).select("a.click_id", "b.purchase_id")

    for bucket in (900.0, 450.0, 37.0):
        got = interval_join_bucketed(
            left, right, key="user_id",
            left_ts="click_ts", right_ts="purchase_ts",
            lower_seconds=0.0, upper_seconds=900.0, bucket_seconds=bucket,
        )
        assert key_set(got) == key_set(naive), f"bucket={bucket}"
    pairs = key_set(naive)
    assert (500, 2000) in pairs and (500, 2001) in pairs
    assert (500, 2002) not in pairs


def test_interval_join_bucketed_negative_lower_bound(spark):
    """Windows reaching BACKWARD in time (lower < 0) — purchases up to
    15 min before each click — bucket arithmetic must handle negative
    offsets and buckets straddling zero."""
    import random

    from spot_anomalies_flink_workshop_resources_spark.operators.asof import (
        interval_join_bucketed,
    )

    t0 = dt.datetime(1970, 1, 1, 0, 10)  # near epoch: negative (ts+lower)
    rng = random.Random(5)
    left = spark.createDataFrame(
        [("u", i, t0 + dt.timedelta(seconds=rng.randint(0, 3600)))
         for i in range(60)],
        "user_id string, click_id long, click_ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", 1000 + i, t0 + dt.timedelta(seconds=rng.randint(0, 3600)))
         for i in range(60)],
        "user_id string, purchase_id long, purchase_ts timestamp",
    )
    naive = left.alias("a").join(
        right.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.purchase_ts") >= F.col("a.click_ts") - F.expr("INTERVAL 900 SECONDS"))
        & (F.col("b.purchase_ts") <= F.col("a.click_ts")),
    ).select("a.click_id", "b.purchase_id")
    got = interval_join_bucketed(
        left, right, key="user_id", left_ts="click_ts", right_ts="purchase_ts",
        lower_seconds=-900.0, upper_seconds=0.0, bucket_seconds=450.0,
    )
    assert {(r.click_id, r.purchase_id) for r in got.collect()} == {
        (r.click_id, r.purchase_id) for r in naive.collect()
    }
