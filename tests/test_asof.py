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
