"""Null / NaN / edge semantics of the libm-exact ln/exp wrappers.

ADVICE r7: Arrow hands SQL NULLs to a float64 pandas UDF as NaN, so the
UDF body alone returned NaN for NULL input, diverging from F.log/F.exp.
The wrappers now mask NULL JVM-side; these tests pin the contract
against the builtins on every input class.
"""

import math

from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.functions.libm import (
    libm_exp,
    libm_log,
)


def _rows(spark):
    # NULL, NaN, negative, zero, subnormal-ish, ordinary, large
    vals = [None, float("nan"), -2.5, 0.0, 1e-300, 0.7, 3.25, 700.0, 710.0]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, x double"
    )


def test_libm_log_matches_builtin_null_semantics(spark):
    df = _rows(spark).select(
        "i",
        F.log("x").alias("ref"),
        libm_log(F.col("x")).alias("got"),
    )
    for r in df.collect():
        if r.ref is None:
            assert r.got is None, f"row {r.i}: expected NULL, got {r.got}"
        elif math.isnan(r.ref):
            assert r.got is not None and math.isnan(r.got)
        else:
            assert r.got == r.ref or abs(r.got - r.ref) <= abs(r.ref) * 1e-15


def test_libm_exp_matches_builtin_null_semantics(spark):
    df = _rows(spark).select(
        "i",
        F.exp("x").alias("ref"),
        libm_exp(F.col("x")).alias("got"),
    )
    for r in df.collect():
        if r.ref is None:
            assert r.got is None, f"row {r.i}: expected NULL, got {r.got}"
        elif math.isnan(r.ref):
            assert r.got is not None and math.isnan(r.got)
        elif math.isinf(r.ref):
            assert math.isinf(r.got)
        else:
            assert r.got == r.ref or abs(r.got - r.ref) <= abs(r.ref) * 1e-15


def test_libm_null_isnull_filter(spark):
    # The regression that motivated the fix: filtering on isNull after
    # libm_log must treat NULL input rows as NULL output rows.
    df = _rows(spark).select("i", libm_log(F.col("x")).alias("y"))
    null_in_rows = {0, 2, 3}  # NULL, negative, zero -> NULL out (like F.log)
    got = {r.i for r in df.where(F.col("y").isNull()).collect()}
    assert got == null_in_rows
