"""TIMESTAMP vs TIMESTAMP_NTZ type-agnosticism (functions/timeutil.py).

The harness parquet has shipped event-time columns both tz-aware and as
TIMESTAMP_NTZ (no zone). NTZ cannot cast to DOUBLE and cannot carry a
streaming watermark, so every operator with epoch arithmetic or a
watermark must accept either flavor and produce IDENTICAL results —
pinned here by running the same input through both typings.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.functions.timeutil import (
    cast_timestamps_ntz,
    ts_seconds,
)
from spot_anomalies_flink_workshop_resources_spark.operators.asof import (
    interval_join_bucketed,
)
from spot_anomalies_flink_workshop_resources_spark.operators.detection import (
    detect_attack_runs,
    detect_attack_runs_skew_split,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)

DETECT_KW = dict(
    key_col="k",
    time_col="ts",
    order_col="oid",
    metric_col="m",
    low_threshold=10.0,
    high_threshold=20.0,
    min_run=2,
    max_run=5,
    window_seconds=3600.0,
)


def _events(spark, ntz: bool):
    rows = []
    oid = 0
    for k in ("a", "b"):
        for i in range(4):  # run of 4 anomalous
            rows.append((k, T0 + dt.timedelta(seconds=oid), oid, 1.0))
            oid += 1
        rows.append((k, T0 + dt.timedelta(seconds=oid), oid, 99.0))  # trigger
        oid += 1
    df = spark.createDataFrame(rows, "k string, ts timestamp, oid long, m double")
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz")) if ntz else df


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ts_seconds_equal_across_typings(spark):
    tz = _events(spark, ntz=False).select(ts_seconds(F.col("ts")).alias("s"))
    ntz = _events(spark, ntz=True).select(ts_seconds(F.col("ts")).alias("s"))
    assert _sorted_rows(tz) == _sorted_rows(ntz)
    assert dict(ntz.dtypes)["s"] == "double"


def test_detector_identical_on_ntz_input(spark):
    out_tz = detect_attack_runs(_events(spark, ntz=False), **DETECT_KW)
    out_ntz = detect_attack_runs(_events(spark, ntz=True), **DETECT_KW)
    rows_tz, rows_ntz = _sorted_rows(out_tz), _sorted_rows(out_ntz)
    assert rows_tz == rows_ntz
    assert len(rows_ntz) == 2  # one match per key
    assert out_tz.schema == out_ntz.schema  # epoch doubles either way


def test_skew_twin_identical_on_ntz_input(spark):
    out_tz = detect_attack_runs_skew_split(
        _events(spark, ntz=False), **DETECT_KW, bucket_seconds=3.0
    )
    out_ntz = detect_attack_runs_skew_split(
        _events(spark, ntz=True), **DETECT_KW, bucket_seconds=3.0
    )
    assert _sorted_rows(out_tz) == _sorted_rows(out_ntz)
    assert len(_sorted_rows(out_ntz)) == 2


def test_interval_join_bucketed_on_ntz_input(spark):
    def frames(ntz):
        ev = _events(spark, ntz)
        left = ev.select("k", F.col("ts").alias("lts"), F.col("oid").alias("lid"))
        right = ev.select("k", F.col("ts").alias("rts"), F.col("oid").alias("rid"))
        return left, right

    expected = None
    for ntz in (False, True):
        left, right = frames(ntz)
        out = interval_join_bucketed(
            left, right, key="k", left_ts="lts", right_ts="rts",
            lower_seconds=0.0, upper_seconds=2.0,
        ).select("k", "lid", "rid")
        got = _sorted_rows(out)
        if expected is None:
            expected = got
            assert len(got) > 0
        else:
            assert got == expected


def test_cast_timestamps_ntz_targets_only_tz_aware(spark):
    df = spark.createDataFrame(
        [(T0, 1)], "ts timestamp, x long"
    ).withColumn("tntz", F.col("ts").cast("timestamp_ntz"))
    out = cast_timestamps_ntz(df)
    assert dict(out.dtypes) == {"ts": "timestamp_ntz", "tntz": "timestamp_ntz", "x": "bigint"}
    noop = cast_timestamps_ntz(df, when=False)
    assert dict(noop.dtypes)["ts"] == "timestamp"
    # values survive the cast (UTC session tz makes it an identity)
    assert out.select(ts_seconds(F.col("ts"))).first()[0] == pytest.approx(
        T0.replace(tzinfo=dt.timezone.utc).timestamp()
    )


def test_streaming_builders_accept_ntz(spark, tmp_path):
    """session/tumbling builders watermark NTZ input without
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE, and results match the tz run."""
    from spot_anomalies_flink_workshop_resources_spark.streaming.windows import (
        tumbling_rollup_stream,
    )

    results = {}
    for ntz in (False, True):
        src = str(tmp_path / f"src_{ntz}")
        ev = _events(spark, ntz).withColumn("value", F.col("m"))
        ev.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        rolled = tumbling_rollup_stream(
            stream, key_col="k", time_col="ts", width="5 seconds"
        )
        name = f"ntz_roll_{ntz}"
        q = (
            rolled.writeStream.format("memory").queryName(name)
            .outputMode("append").start()
        )
        q.processAllAvailable()
        q.stop()
        results[ntz] = _sorted_rows(spark.table(name))
    assert results[False] == results[True]
    assert len(results[True]) > 0
