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


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's headline counts must track the registry — the
    round-2 doc drifted (claimed 68 oracles, registry had 70). The doc
    states '<Q> queries, <O> oracle-backed, <R> rows-only'; this pins
    all three to build_queries()/build_oracles()."""
    import re

    from spot_anomalies_flink_workshop_resources_spark.plans import harness

    q, o = harness.build_queries(), harness.build_oracles()
    assert set(o) <= set(q), "oracle without a registered query"
    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(
        r"\*\*(\d+) queries, (\d+) oracle-backed, (\d+) rows-only", text
    )
    assert m, "COVERAGE.md counts line missing"
    assert (int(m[1]), int(m[2]), int(m[3])) == (
        len(q),
        len(o),
        len(q) - len(o),
    ), "COVERAGE.md counts drifted from the registry"
