from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from spot_anomalies_flink_workshop_resources_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
