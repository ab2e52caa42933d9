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


def test_streaming_snapshot_equals_batch_compaction(spark, sf_dir):
    """The COMPLETE-mode streaming snapshot (max_by per key) run to
    completion must equal the batch row_number compaction on real
    harness data — including delete suppression."""
    from pyspark.sql import functions as F

    from spot_anomalies_flink_workshop_resources_spark.plans.harness import (
        stream_cdc_snapshot,
    )
    from spot_anomalies_flink_workshop_resources_spark.plans.relational import (
        events_cdc_snapshot,
    )

    batch = sorted(tuple(r) for r in events_cdc_snapshot(spark, sf_dir).collect())
    stream = sorted(tuple(r) for r in stream_cdc_snapshot(spark, sf_dir).collect())
    assert stream == batch and len(batch) > 0
    # deletes actually suppressed: some users' latest event is an error
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = events.select("user_id").distinct().count()
    assert len(batch) < n_users


def test_null_op_upserts_instead_of_deleting(spark):
    """A winning row with op=NULL (CDC feeds often omit op on plain
    inserts) must keep the key — NULL != 'delete' is NULL in 3VL and
    would silently drop it without the coalesce guard."""
    got = _snap(
        spark,
        [
            ("a", 1, "upsert", "v1"),
            ("a", 2, None, "v2"),
            ("b", 1, None, "w1"),
        ],
    )
    assert got == {"a": "v2", "b": "w1"}


def test_batch_and_stream_compaction_share_schema(spark):
    """The streaming twin must return the batch form's exact schema
    (op column included) so the two are drop-in interchangeable."""
    from spot_anomalies_flink_workshop_resources_spark.operators.cdc import (
        compact_log_stream,
    )

    df = spark.createDataFrame(
        [("a", 1, "upsert", "v1"), ("b", 2, "delete", "w1")], SCHEMA
    )
    batch = compact_log(df, key_cols=["k"], order_cols=["seq"], op_col="op")
    # streaming plan built over the same schema (no need to execute: the
    # analyzed schema is the contract)
    stream_schema = compact_log_stream(
        df, key_cols=["k"], order_cols=["seq"], op_col="op"
    ).schema
    assert [f.name for f in stream_schema] == batch.columns


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


def test_changelog_agg_retraction_algebra(spark):
    """Group transitions, delete/re-insert, and full-group retraction
    must all telescope to the live snapshot's aggregate."""
    from pyspark.sql import Row

    from spot_anomalies_flink_workshop_resources_spark.operators.cdc import (
        changelog_agg,
    )

    rows = [
        # key 1: insert in group a, update transitions a -> b
        Row(k=1, seq=1, grp="a", v=10.0, op="upsert"),
        Row(k=1, seq=2, grp="b", v=7.0, op="upsert"),
        # key 2: insert a, delete, re-insert a with new value
        Row(k=2, seq=1, grp="a", v=100.0, op="upsert"),
        Row(k=2, seq=2, grp="a", v=0.0, op="delete"),
        Row(k=2, seq=3, grp="a", v=5.0, op="upsert"),
        # key 3: insert then delete -> contributes nothing
        Row(k=3, seq=1, grp="c", v=50.0, op="upsert"),
        Row(k=3, seq=2, grp="c", v=0.0, op="delete"),
        # key 4: delete with no prior state -> no-op
        Row(k=4, seq=1, grp="c", v=9.0, op="delete"),
    ]
    out = {
        r.grp: (r.n_live, r.sum_live)
        for r in changelog_agg(
            spark.createDataFrame(rows),
            key_cols=["k"],
            order_cols=["seq"],
            op_col="op",
            group_col="grp",
            value_col="v",
        ).collect()
    }
    # live state: key1 -> (b, 7), key2 -> (a, 5); group c fully retracted
    assert out == {"a": (1, 5.0), "b": (1, 7.0)}


def test_scd2_versions_and_delete_close(spark):
    """SCD2: upserts open versions closed by the NEXT change (delete
    included); a trailing delete leaves the key with no current row."""
    from spot_anomalies_flink_workshop_resources_spark.operators.cdc import (
        scd2_history,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, "upsert", "v1"),
            ("a", 3, "upsert", "v3"),
            ("a", 5, "delete", None),
            ("b", 2, "upsert", "w1"),
        ],
        SCHEMA,
    )
    got = {
        (r.k, r.payload): (r.valid_to, r.is_current)
        for r in scd2_history(
            df, key_cols=["k"], order_cols=["seq"], op_col="op"
        ).collect()
    }
    assert got == {
        ("a", "v1"): (3, False),
        ("a", "v3"): (5, False),  # closed by the delete, not current
        ("b", "w1"): (None, True),
    }


def test_scd2_null_op_upserts(spark):
    """NULL op = plain insert (same convention as compact_log)."""
    from spot_anomalies_flink_workshop_resources_spark.operators.cdc import (
        scd2_history,
    )

    df = spark.createDataFrame(
        [("a", 1, None, "v1"), ("a", 2, "upsert", "v2")], SCHEMA
    )
    rows = scd2_history(
        df, key_cols=["k"], order_cols=["seq"], op_col="op"
    ).collect()
    assert {(r.payload, r.is_current) for r in rows} == {
        ("v1", False),
        ("v2", True),
    }


def test_scd2_current_rows_equal_compaction(spark):
    """Internal consistency: the SCD2 history's is_current slice IS the
    last-writer-wins snapshot — on a randomized log the two operators
    must agree exactly."""
    import random

    from spot_anomalies_flink_workshop_resources_spark.operators.cdc import (
        compact_log,
        scd2_history,
    )

    rng = random.Random(99)
    rows = []
    for k in "abcdefgh":
        for seq in range(1, rng.randint(2, 7)):
            op = "delete" if rng.random() < 0.25 else "upsert"
            rows.append((k, seq, op, f"{k}{seq}"))
    df = spark.createDataFrame(rows, SCHEMA)
    snap = {
        r.k: r.payload
        for r in compact_log(
            df, key_cols=["k"], order_cols=["seq"], op_col="op"
        ).collect()
    }
    current = {
        r.k: r.payload
        for r in scd2_history(
            df, key_cols=["k"], order_cols=["seq"], op_col="op"
        )
        .where("is_current")
        .collect()
    }
    assert current == snap


def test_scd2_history_sql_default_projection_is_clean():
    """With select_cols=None the rendered SQL must not leak the helper
    _op column or emit a duplicate valid_to (ADVICE r5) — verified by
    actually running it in DuckDB."""
    import duckdb

    from spot_anomalies_flink_workshop_resources_spark.operators.cdc import (
        scd2_history_sql,
    )

    sql = scd2_history_sql(
        "log", key_cols=["k"], order_cols=["seq"], op_expr="op"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE log AS SELECT * FROM (VALUES "
        "('a', 1, 'upsert', 'v1'), ('a', 3, 'upsert', 'v3'), "
        "('a', 5, 'delete', NULL), ('b', 2, 'upsert', 'w1')"
        ") t(k, seq, op, payload)"
    )
    rel = con.sql(sql)
    assert rel.columns == ["k", "seq", "op", "payload", "valid_to", "is_current"]
    assert "_op" not in rel.columns
    got = {
        (r[0], r[3]): (r[4], r[5])
        for r in rel.fetchall()
    }
    assert got == {
        ("a", "v1"): (3, False),
        ("a", "v3"): (5, False),
        ("b", "w1"): (None, True),
    }
