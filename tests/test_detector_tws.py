"""transformWithStateInPandas backend: plan construction always; full
execution only where the protobuf runtime exists (it speaks protobuf to
the TWS state server, and this container's protobuf is not importable)."""

from __future__ import annotations

import pytest

from spot_anomalies_flink_workshop_resources_spark.plans import harness
from spot_anomalies_flink_workshop_resources_spark.streaming.detector_tws import (
    detect_attack_runs_tws,
)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_plan_constructs(spark, sf_dir):
    alerts = detect_attack_runs_tws(
        harness._events_stream(spark, sf_dir), **harness.FLAGSHIP_PARAMS
    )
    assert alerts.isStreaming
    assert [f.name for f in alerts.schema.fields] == [
        "target_key",
        "attack_start_time",
        "attack_end_time",
        "attacker_id",
        "fragment_count",
        "avg_packets",
        "avg_fragment_size",
        "size_reduction_percent",
    ]


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas execution needs google.protobuf",
)
def test_tws_equals_batch_oracle(spark, sf_dir):
    alerts = detect_attack_runs_tws(
        harness._events_stream(spark, sf_dir), **harness.FLAGSHIP_PARAMS
    )
    out = harness._run_to_completion(alerts, spark)
    batch = harness.cep_fragmentation(spark, sf_dir)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, batch.withColumn("target_key", batch.target_key.cast("string"))
            .select(*out.columns).collect())
    )
