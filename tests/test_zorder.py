"""Morton/Z-order key: bit-level equality with a Python reference, the
locality property that makes the layout useful (fixing one dimension
confines keys to O(sqrt(space)) of the key range per value), and the
payoff demonstration: a z-ordered parquet layout lets BOTH a user
predicate and a day predicate skip most files under min/max stats,
where a single-column sort serves only its own column (VERDICT r3 #5).
Cross-engine equality is covered by the events_zorder_layout /
events_zorder_balanced oracles."""

from __future__ import annotations

import glob
import random

from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.operators.zorder import (
    DEFAULT_BITS,
    morton_interleave,
    zorder_events_balanced,
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


def _files_admitting(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files a min/max-pruning reader must touch, total files) for the
    predicate ``col BETWEEN lo AND hi`` — computed from the parquet
    row-group statistics, i.e. exactly the skipping evidence a scan
    uses."""
    import pyarrow.parquet as pq

    hit = total = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        total += 1
        idx = md.schema.names.index(col)
        stats = [
            md.row_group(rg).column(idx).statistics
            for rg in range(md.num_row_groups)
        ]
        if min(s.min for s in stats) <= hi and max(s.max for s in stats) >= lo:
            hit += 1
    return hit, total


def test_zorder_layout_prunes_files_on_both_dimensions(spark, sf_dir, tmp_path):
    """Write events z-ordered (repartitionByRange(zval) + sort within)
    and user-sorted (the single-column control); count the files each
    layout must read for a user point predicate and a 3-day range
    predicate. The z layout must serve BOTH dimensions; the control
    serves only its own."""
    n_files = 24
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    z = zorder_events_balanced(ev)

    zpath, upath = str(tmp_path / "zlay"), str(tmp_path / "ulay")
    for df, col, path in ((z, "zval", zpath), (z, "user_id", upath)):
        (
            df.repartitionByRange(n_files, col)
            .sortWithinPartitions(col)
            .write.mode("overwrite")
            .parquet(path)
        )

    dmin = z.agg(F.min("day_num")).collect()[0][0]
    z_user, ztot = _files_admitting(zpath, "user_id", 42, 42)
    z_day, _ = _files_admitting(zpath, "day_num", dmin + 10, dmin + 12)
    u_user, utot = _files_admitting(upath, "user_id", 42, 42)
    u_day, _ = _files_admitting(upath, "day_num", dmin + 10, dmin + 12)

    # range partitioning on a low-cardinality column can leave some
    # partitions empty; both layouts must still be genuinely multi-file
    assert ztot >= n_files // 2 and utot >= n_files // 2
    # the z layout prunes meaningfully on BOTH dimensions
    # (measured at sf0.001: user 11/24, day 8/24)
    assert z_user <= ztot * 0.6, (z_user, ztot)
    assert z_day <= ztot * 0.6, (z_day, ztot)
    # the single-column control is great on its own column and useless
    # on the other: that asymmetry is the reason zorder exists
    assert u_user <= utot * 0.25, (u_user, utot)
    assert u_day >= utot * 0.9, (u_day, utot)
    # combined two-predicate workload: z reads fewer files overall
    assert z_user + z_day < u_user + u_day


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
