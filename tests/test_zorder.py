"""Morton/Z-order key: bit-level equality with a Python reference and
the locality property that makes the layout useful (fixing one
dimension confines keys to O(sqrt(space)) of the key range per value).
Cross-engine equality is covered by the events_zorder_layout oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.operators.zorder import (
    DEFAULT_BITS,
    morton_interleave,
)


def _ref_morton(x: int, y: int, bits: int = DEFAULT_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference(spark):
    rng = random.Random(42)
    pts = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    pts += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 2)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _ref_morton(x, y), (x, y)


def test_morton_is_a_bijection_on_the_grid(spark):
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    zs = [
        r.z
        for r in df.select(
            morton_interleave(F.col("x"), F.col("y"), bits=5).alias("z")
        ).collect()
    ]
    assert sorted(zs) == list(range(1024))


def test_fixed_dimension_locality():
    """For fixed y, the z-values of all x fall in few contiguous runs
    relative to the full key space — the pruning property: a reader
    filtering on y skips most z-ranges."""
    y = 37
    zs = sorted(_ref_morton(x, y, 8) for x in range(256))
    # total span the y-slice touches vs the full 16-bit key space
    span = zs[-1] - zs[0] + 1
    # 256 values spread across the space but in interleaved clusters;
    # count contiguous-run breaks at gaps > 1
    runs = 1 + sum(1 for a, b in zip(zs, zs[1:]) if b - a > 1)
    assert runs <= 128  # at most half the points start a new run
    assert span < (1 << 16)  # never the whole space
