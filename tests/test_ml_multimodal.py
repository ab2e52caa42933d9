"""IPInsights-style scorer (M1-M3) and multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.ml.ipinsights import (
    IPInsightsModel,
    read_training_csv,
    threshold_filter,
    training_pairs_from_events,
    write_training_csv,
)
from spot_anomalies_flink_workshop_resources_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def model(spark):
    # 20 entities, each habitually paired with its own 3 IPs
    pairs = [
        (f"eni-{e:03d}", f"10.0.{e}.{i}") for e in range(20) for i in range(3)
    ] * 30
    df = spark.createDataFrame(pairs, ["entity", "ip"])
    return IPInsightsModel.train(df, vector_dim=16, num_epochs=8, seed=1)


def test_stable_index_matches_global_row_number(spark):
    """The distributed vocab index (range partitions + offsets) must
    equal row_number() over (ORDER BY value) - 1 — the single-task
    global window it replaced (VERDICT r2 #4) — including with empty
    range partitions (num_partitions > distinct values)."""
    import random

    from spot_anomalies_flink_workshop_resources_spark.ml.ipinsights import (
        _stable_index_frame,
    )

    rng = random.Random(7)
    vals = [f"v{rng.randint(0, 400):04d}" for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], ["entity"])
    expected = {v: i for i, v in enumerate(sorted(set(vals)))}
    for n_parts in (1, 5, 8, len(expected) + 10):
        got = {
            r["entity"]: r["ei"]
            for r in _stable_index_frame(
                df, "entity", "ei", num_partitions=n_parts
            ).collect()
        }
        assert got == expected, f"num_partitions={n_parts}"


def test_sharded_entity_broadcast_bit_identical(spark):
    """param_mode='sharded_entities' must produce BIT-identical
    matrices to full-broadcast training: same rows, same order, same
    RNG, same float ops — only the per-executor transfer changes
    (one E slice per shard instead of the whole matrix; the SCALE.md
    §'Known costs' #6 closure)."""
    import numpy as np

    pairs = [
        (f"eni-{e:03d}", f"10.0.{e}.{i}") for e in range(24) for i in range(3)
    ] * 10
    df = spark.createDataFrame(pairs, ["entity", "ip"])
    kw = dict(vector_dim=8, num_epochs=3, seed=5, num_shards=6)
    full = IPInsightsModel.train(df, param_mode="broadcast", **kw)
    sharded = IPInsightsModel.train(df, param_mode="sharded_entities", **kw)
    assert full.entity_index == sharded.entity_index
    assert full.ip_index == sharded.ip_index
    assert np.array_equal(full.entity_vecs, sharded.entity_vecs)
    assert np.array_equal(full.ip_vecs, sharded.ip_vecs)


def test_hash_cap_bounds_model_and_is_bit_stable(spark):
    """num_entity_vectors / num_ip_vectors (SageMaker notebook cell 11):
    parameter matrices must be config-bounded — (cap, dim) regardless of
    vocab size — with NO vocab dict on the driver, and training must be
    seeded bit-stable run-to-run."""
    import numpy as np

    pairs = [
        (f"eni-{e:03d}", f"10.0.{e}.{i}") for e in range(40) for i in range(3)
    ] * 10
    df = spark.createDataFrame(pairs, ["entity", "ip"])
    kw = dict(
        vector_dim=8,
        num_epochs=3,
        seed=5,
        num_entity_vectors=16,  # < 40 distinct entities: collisions expected
        num_ip_vectors=32,
    )
    m1 = IPInsightsModel.train(df, **kw)
    m2 = IPInsightsModel.train(df, **kw)
    assert m1.entity_index is None and m1.ip_index is None  # no vocab dict
    assert m1.entity_vecs.shape == (16, 8)
    assert m1.ip_vecs.shape == (32, 8)
    assert np.array_equal(m1.entity_vecs, m2.entity_vecs)  # bit-stable
    assert np.array_equal(m1.ip_vecs, m2.ip_vecs)
    # scoring still works end-to-end and separates familiar from probes
    probe = spark.createDataFrame(
        [("eni-000", "10.0.0.0"), ("eni-000", "10.0.33.2")], ["entity", "ip"]
    )
    scored = {r.ip: r.anomaly_score for r in m1.score_dataframe(spark, probe).collect()}
    assert len(scored) == 2  # both rows scored (hash mode: no unseen gap)


def test_hash_slot_spark_python_agree(spark):
    """The executor-side slot expression (_hash_slot_col) and the
    driver/scorer-side _hash_slot must agree value-for-value — the
    invariant that lets hash-cap mode skip shipping any vocabulary."""
    from spot_anomalies_flink_workshop_resources_spark.ml.ipinsights import (
        _hash_slot,
        _hash_slot_col,
    )

    vals = [f"eni-{i:05d}" for i in range(200)] + ["", "é-unicode", "10.0.0.1"]
    df = spark.createDataFrame([(v,) for v in vals], ["entity"])
    got = {
        r["entity"]: r["slot"]
        for r in df.select(
            "entity", _hash_slot_col("entity", 97).alias("slot")
        ).collect()
    }
    assert got == {v: _hash_slot(v, 97) for v in vals}


def test_familiar_pairs_score_lower_than_probes(spark, model):
    familiar = [(f"eni-{e:03d}", f"10.0.{e}.0") for e in range(20)]
    probes = [(f"eni-{e:03d}", f"10.0.{(e + 7) % 20}.0") for e in range(20)]
    df = spark.createDataFrame(familiar + probes, ["entity", "ip"])
    scored = model.score_dataframe(spark, df).collect()
    fam = [r.anomaly_score for r in scored[:20]]
    prb = [r.anomaly_score for r in scored[20:]]
    # ordering consistency (M3 contract): familiar < unfamiliar on average
    # and the medians separate cleanly
    assert sum(fam) / 20 < sum(prb) / 20
    assert sorted(fam)[10] < sorted(prb)[10]


def test_threshold_filter_and_unseen_neutrality(spark, model):
    df = spark.createDataFrame(
        [("eni-000", "10.0.0.0"), ("never-seen", "1.2.3.4")], ["entity", "ip"]
    )
    scored = model.score_dataframe(spark, df)
    unseen = scored.where(F.col("entity") == "never-seen").collect()[0]
    assert unseen.anomaly_score == 0.0  # cold start: no evidence
    kept = threshold_filter(scored, threshold=1e9).count()
    assert kept == 0


def test_csv_contract_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("eni-095bb4db87156aa49", "10.0.3.60")] * 4, ["entity", "ip"]
    )
    path = str(tmp_path / "train_csv")
    write_training_csv(df, path)
    back = read_training_csv(spark, path)
    assert back.columns == ["entity", "ip"]
    assert back.count() == 4
    # headerless: no header row leaked into data
    assert back.where(F.col("entity") == "entity").count() == 0


def test_training_pairs_query_filters_internal(spark):
    rows = [
        Row(writer_id="eni-1", ip_src="10.0.0.1", ip_dst="10.0.0.2"),
        Row(writer_id="eni-2", ip_src="8.8.8.8", ip_dst="10.0.0.2"),
        Row(writer_id="eni-3", ip_src="10.1.1.1", ip_dst="99.0.0.1"),
    ]
    out = training_pairs_from_events(spark.createDataFrame(rows)).collect()
    assert [(r.entity, r.ip) for r in out] == [("eni-1", "10.0.0.1")]


PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 20
JPG = b"\xff\xd8\xff\xe0" + b"\x00" * 20
WAV = b"RIFF" + b"\x00" * 20


def _media(spark):
    rows = [
        (0, "image", bytearray(PNG), (4, 4, None)),
        (1, "image", bytearray(JPG), (8, 8, None)),
        (2, "audio", bytearray(WAV), (None, None, 2500)),
        (3, "unknown", bytearray(b"plain"), (None, None, None)),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_sniff_media_type(spark):
    out = {r.media_id: r.sniffed_type for r in mm.sniff_media_type(_media(spark)).collect()}
    assert out == {
        0: "image/png",
        1: "image/jpeg",
        2: "audio/wav",
        3: "application/octet-stream",
    }


def test_media_stats(spark):
    out = mm.media_stats(_media(spark)).collect()
    by_id = {r.media_id: r for r in out}
    assert by_id[0].n_bytes == len(PNG)
    assert len(by_id[0].content_md5) == 32


def test_extract_features_shape_and_determinism(spark):
    out = mm.extract_features(_media(spark)).collect()
    by_id = {r.media_id: r.features for r in out}
    assert all(len(v) == mm.FEATURE_DIM for v in by_id.values())
    assert all(0.0 <= x <= 1.0 for v in by_id.values() for x in v)
    # deterministic: same content -> same features across runs
    again = {r.media_id: r.features for r in mm.extract_features(_media(spark)).collect()}
    assert by_id == again
    assert by_id[0] != by_id[1]


def test_decode_image_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_image(PNG)


def test_frame_sample_plan(spark):
    df = _media(spark).where(F.col("media_id") == 2)  # duration 2500 ms
    out = mm.frame_sample_plan(df, every_ms=1000).collect()
    assert [r.frame_ts_ms for r in out] == [0, 1000, 2000]


def test_training_is_sharded_and_discriminates_at_any_shard_count(spark):
    """Distributed trainer: parameter-averaged shard SGD must preserve
    the familiar-vs-probe separation regardless of shard count (1 shard
    == classic sequential SGD; 8 shards == fully parallel)."""
    pairs = [
        (f"eni-{e:03d}", f"10.0.{e}.{i}") for e in range(20) for i in range(3)
    ] * 30
    df = spark.createDataFrame(pairs, ["entity", "ip"])
    for shards in (1, 8):
        m = IPInsightsModel.train(
            df, vector_dim=16, num_epochs=8, seed=1, num_shards=shards
        )
        familiar = [(f"eni-{e:03d}", f"10.0.{e}.0") for e in range(20)]
        probes = [(f"eni-{e:03d}", f"10.0.{(e + 7) % 20}.0") for e in range(20)]
        sdf = spark.createDataFrame(familiar + probes, ["entity", "ip"])
        scored = m.score_dataframe(spark, sdf).collect()
        fam = [r.anomaly_score for r in scored[:20]]
        prb = [r.anomaly_score for r in scored[20:]]
        assert sum(fam) / 20 < sum(prb) / 20, f"shards={shards}"


def test_byte_shingle_pairs_same_payload_different_container(spark):
    """The same 64-byte payload behind PNG vs JPEG headers must pair
    (headers differ in only the first windows); an unrelated payload
    must not pair with either."""
    payload = bytes(range(64))  # 64 distinct bytes -> distinct windows
    other = bytes(reversed(range(64)))
    rows = [
        (0, "image", bytearray(b"\x89PNG" + payload), (None, None, None)),
        (1, "image", bytearray(b"\xff\xd8\xff\xe0" + payload), (None, None, None)),
        (2, "image", bytearray(b"\x89PNG" + other), (None, None, None)),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.byte_shingle_pairs(df, threshold=0.5).collect()
    pairs = {(r.media_a, r.media_b) for r in out}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)
    j = {(r.media_a, r.media_b): r.jaccard for r in out}[(0, 1)]
    # 68 bytes -> 16 windows each; only window 0 touches the magic, so
    # 15 of 16 are shared: 15 / (16 + 16 - 15)
    assert j == 15 / 17


def test_byte_shingle_pairs_df_cap_prunes_hot_windows(spark):
    """A window shared by EVERY media is pruned at df_cap, so two media
    whose only overlap is the hot window do not pair."""
    hot = bytes([7] * 12)
    rows = [
        (i, "bin", bytearray(hot + bytes([i] * 20)), (None, None, None))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.byte_shingle_pairs(df, threshold=0.1, df_cap=2).collect()
    assert out == []
