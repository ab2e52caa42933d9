"""CDC log compaction: hand-crafted upsert/delete/re-upsert sequences.
Cross-engine equality is covered by the events_cdc_snapshot oracle."""

from __future__ import annotations

from spot_anomalies_flink_workshop_resources_spark.operators.cdc import compact_log

SCHEMA = "k string, seq long, op string, payload string"


def _snap(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r.k: r.payload
        for r in compact_log(
            df, key_cols=["k"], order_cols=["seq"], op_col="op"
        ).collect()
    }


def test_last_writer_wins(spark):
    got = _snap(
        spark,
        [
            ("a", 1, "upsert", "v1"),
            ("a", 3, "upsert", "v3"),
            ("a", 2, "upsert", "v2"),
            ("b", 1, "upsert", "w1"),
        ],
    )
    assert got == {"a": "v3", "b": "w1"}


def test_delete_removes_key(spark):
    got = _snap(
        spark,
        [
            ("a", 1, "upsert", "v1"),
            ("a", 2, "delete", None),
            ("b", 1, "upsert", "w1"),
        ],
    )
    assert got == {"b": "w1"}


def test_reupsert_after_delete_resurrects(spark):
    got = _snap(
        spark,
        [
            ("a", 1, "upsert", "v1"),
            ("a", 2, "delete", None),
            ("a", 3, "upsert", "v3"),
        ],
    )
    assert got == {"a": "v3"}


def test_stale_delete_is_ignored(spark):
    # a delete that is NOT the latest row must not remove the key
    got = _snap(
        spark,
        [
            ("a", 2, "upsert", "v2"),
            ("a", 1, "delete", None),
        ],
    )
    assert got == {"a": "v2"}
