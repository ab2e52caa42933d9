"""Regression tests for tools/check_oracles.py itself.

Round-1 lesson: the tool float-coerced numeric cells, so a DuckDB
HUGEINT (uncast integer SUM -> Arrow decimal128) compared equal to a
Spark bigint and five oracles shipped "green" locally while the
driver's hash gate failed them. The tool must now be driver-strict:
an integer-SUM oracle without CAST(... AS BIGINT) is a FAIL.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from tools.check_oracles import compare


def _con():
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS SELECT * FROM (VALUES (1, 10), (1, 20), (2, 5)) v(k, x)")
    return con


def test_uncast_integer_sum_fails_type_strict(spark):
    sdf = spark.createDataFrame([(1, 30), (2, 5)], "k int, s bigint")
    msg = compare("hugeint_probe", sdf, _con(), "SELECT k, SUM(x) AS s FROM t GROUP BY k")
    assert msg.startswith("FAIL"), msg
    assert "type mismatch" in msg, msg


def test_cast_integer_sum_passes(spark):
    sdf = spark.createDataFrame([(1, 30), (2, 5)], "k int, s bigint")
    msg = compare(
        "cast_probe", sdf, _con(),
        "SELECT k, CAST(SUM(x) AS BIGINT) AS s FROM t GROUP BY k",
    )
    assert msg.startswith("OK"), msg


def test_value_mismatch_still_fails(spark):
    sdf = spark.createDataFrame([(1, 31), (2, 5)], "k int, s bigint")
    msg = compare(
        "value_probe", sdf, _con(),
        "SELECT k, CAST(SUM(x) AS BIGINT) AS s FROM t GROUP BY k",
    )
    assert msg.startswith("FAIL"), msg
