"""Differential expression fuzzing: random scalar-expression trees
evaluated row-for-row in Spark AND DuckDB over identical data.

The oracle harness checks the hand-written query surface; this widens
the net to the expression grammar itself — arithmetic, comparisons,
boolean logic, CASE, guarded modulo, string functions, and (since
round 5) HIGHER-ORDER functions: random integer folds (plain and over
sorted arrays — the grammar the ordered-fold operators are built
from) and transform/filter/join pipelines, generated as PAIRED
per-dialect spellings from one spec because HOFs share semantics but
not names. A divergence here is an engine-semantics bug the curated
queries might never reach — the paired grammar found one on its first
run (empty-list join: '' in Spark, NULL in DuckDB; pinned below).

Deterministic: seeded generator, fixed row sample; expressions are
evaluated in BATCHES (one query per 40 expressions per engine) so the
whole sweep costs a handful of Spark jobs.

Grammar constraints (semantic compatibility, not convenience):
- small value domains (columns pre-reduced mod small primes) so ANSI
  Spark and DuckDB both stay inside int64 — overflow behavior differs;
- modulo guarded with NULLIF(x, 0) — both engines then yield NULL
  instead of their (different) division-by-zero errors; `/` is
  excluded entirely (int `/` is float division in both dialects,
  which would soften the comparison);
- no floats in the random grammar: integer ops are bit-exact, which
  keeps the comparison exact too.
"""

from __future__ import annotations

import random

import duckdb
import pytest


def _int_expr(rng: random.Random, depth: int) -> str:
    cols = ("a", "b", "c")
    if depth <= 0 or rng.random() < 0.3:
        return rng.choice(
            [rng.choice(cols), str(rng.randint(-9, 99))]
        )
    op = rng.choice(["+", "-", "*", "%", "CASE", "ABS", "LEAST", "GREATEST"])
    if op == "CASE":
        return (
            f"(CASE WHEN {_bool_expr(rng, depth - 1)} "
            f"THEN {_int_expr(rng, depth - 1)} "
            f"ELSE {_int_expr(rng, depth - 1)} END)"
        )
    if op == "ABS":
        return f"ABS({_int_expr(rng, depth - 1)})"
    if op in ("LEAST", "GREATEST"):
        return (
            f"{op}({_int_expr(rng, depth - 1)}, {_int_expr(rng, depth - 1)})"
        )
    if op == "%":
        return (
            f"({_int_expr(rng, depth - 1)} % "
            f"NULLIF({_int_expr(rng, depth - 1)}, 0))"
        )
    return f"({_int_expr(rng, depth - 1)} {op} {_int_expr(rng, depth - 1)})"


def _bool_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0 or rng.random() < 0.4:
        cmp = rng.choice(["<", "<=", "=", "<>", ">", ">="])
        return f"({_int_expr(rng, depth)} {cmp} {_int_expr(rng, depth)})"
    op = rng.choice(["AND", "OR", "NOT"])
    if op == "NOT":
        return f"(NOT {_bool_expr(rng, depth - 1)})"
    return f"({_bool_expr(rng, depth - 1)} {op} {_bool_expr(rng, depth - 1)})"


def _str_expr(rng: random.Random) -> str:
    base = rng.choice(["s", "'xy'", "upper(s)", "lower(s)"])
    form = rng.choice(
        [
            "substr({b}, {i}, {n})",
            "({b} || {b2})",
            "upper({b})",
            "trim({b})",
            "{b}",
        ]
    )
    return form.format(
        b=base,
        b2=rng.choice(["s", "'Q'"]),
        i=rng.randint(1, 3),
        n=rng.randint(0, 4),
    )


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    sql = """
        SELECT l_orderkey AS k,
               CAST(l_partkey % 97 AS BIGINT) AS a,
               CAST(l_suppkey % 89 AS BIGINT) AS b,
               CAST(l_linenumber AS BIGINT) AS c,
               l_returnflag AS s
        FROM lineitem
        ORDER BY 1, 3, 2, 4, 5
        LIMIT 200
    """
    from spot_anomalies_flink_workshop_resources_spark.catalog import (
        register_views,
    )

    register_views(spark, sf_dir)
    sdf = spark.sql(sql)
    sdf.createOrReplaceTempView("fuzz_t")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    con.execute(f"CREATE TABLE fuzz_t AS {sql}")
    return spark, con


def _run_batch(frames, exprs):
    spark, con = frames
    select = ", ".join(f"({e}) AS e{i}" for i, e in enumerate(exprs))
    # (k, c) is NOT unique in the synthetic lineitem; order by the
    # full selected tuple — any remaining ties are value-identical in
    # every compared column, so alignment is safe
    q = f"SELECT {select} FROM fuzz_t ORDER BY k, c, a, b, s"
    srows = [tuple(r) for r in spark.sql(q).collect()]
    orows = [tuple(r) for r in con.execute(q).fetchall()]
    assert len(srows) == len(orows)
    for ridx, (sr, orr) in enumerate(zip(srows, orows)):
        for eidx, (sv, ov) in enumerate(zip(sr, orr)):
            assert sv == ov, (
                f"expr {exprs[eidx]!r} diverges at row {ridx}: "
                f"spark={sv!r} duckdb={ov!r}"
            )


def test_integer_and_boolean_grammar(frames):
    rng = random.Random(20260814)
    exprs = [_int_expr(rng, 4) for _ in range(60)] + [
        f"(CASE WHEN {_bool_expr(rng, 3)} THEN 1 ELSE 0 END)"
        for _ in range(40)
    ]
    for i in range(0, len(exprs), 40):
        _run_batch(frames, exprs[i : i + 40])


def test_string_grammar(frames):
    rng = random.Random(77)
    exprs = [_str_expr(rng) for _ in range(40)]
    _run_batch(frames, exprs)


def test_mixed_case_over_strings(frames):
    rng = random.Random(4242)
    exprs = [
        f"(CASE WHEN length({_str_expr(rng)}) > {rng.randint(0, 3)} "
        f"THEN {_int_expr(rng, 2)} ELSE {_int_expr(rng, 2)} END)"
        for _ in range(40)
    ]
    _run_batch(frames, exprs)


def _run_batch_paired(frames, spark_exprs, duck_exprs):
    """Like _run_batch, but with per-dialect spellings generated from
    ONE spec (higher-order functions share semantics, not names:
    transform/list_transform, array(..)/[..], aggregate/list_reduce)."""
    spark, con = frames
    ssel = ", ".join(f"({e}) AS e{i}" for i, e in enumerate(spark_exprs))
    dsel = ", ".join(f"({e}) AS e{i}" for i, e in enumerate(duck_exprs))
    order = "ORDER BY k, c, a, b, s"
    srows = [
        tuple(r)
        for r in spark.sql(f"SELECT {ssel} FROM fuzz_t {order}").collect()
    ]
    orows = [
        tuple(r)
        for r in con.execute(f"SELECT {dsel} FROM fuzz_t {order}").fetchall()
    ]
    assert len(srows) == len(orows)
    for ridx, (sr, orr) in enumerate(zip(srows, orows)):
        for eidx, (sv, ov) in enumerate(zip(sr, orr)):
            assert sv == ov, (
                f"spec {spark_exprs[eidx]!r} / {duck_exprs[eidx]!r} "
                f"diverges at row {ridx}: spark={sv!r} duckdb={ov!r}"
            )


def _fold_spec(rng: random.Random, sort: bool):
    """One random integer fold over a 3-element array of column
    expressions; acc appears linearly so values stay far from int64
    edges. Returns (spark_sql, duck_sql)."""
    elems = [f"(({_int_expr(rng, 1)}) % 13)" for _ in range(3)]
    init = rng.randint(-9, 99)
    g = f"(({_int_expr(rng, 1)}) % 13)"
    body = rng.choice(
        [
            f"(acc * {rng.choice([2, 3])} + x)",
            "(acc + x)",
            "(acc - x)",
            "LEAST(acc, x)",
            "GREATEST(acc, x)",
            f"(CASE WHEN x > {rng.randint(-5, 5)} THEN (acc + {g}) "
            f"ELSE (acc - x) END)",
        ]
    )
    arr_s = f"array({', '.join(elems)})"
    arr_d = f"[{', '.join(elems)}]"
    if sort:
        arr_s = f"array_sort({arr_s})"
        arr_d = f"list_sort({arr_d})"
    spark_e = (
        f"aggregate({arr_s}, CAST({init} AS BIGINT), (acc, x) -> {body})"
    )
    duck_e = (
        f"list_reduce(list_prepend(CAST({init} AS BIGINT), {arr_d}), "
        f"(acc, x) -> {body})"
    )
    return spark_e, duck_e


def _transform_spec(rng: random.Random):
    """String transform/filter/join pipeline over a small array."""
    suf = rng.choice(["q", "ab", ""])
    minlen = rng.randint(0, 2)
    elems = "s, 'x', upper(s)"
    lam = rng.choice(
        [f"(x || '{suf}')", "upper(x)", "lower(x)", "trim(x || ' ')"]
    )
    # COALESCE on the DuckDB side: array_to_string of an EMPTY list is
    # NULL there while Spark's array_join is '' — a real dialect
    # boundary this fuzzer FOUND (pinned in
    # test_empty_list_join_dialect_boundary); oracle authors must
    # normalize it, so the grammar does too.
    spark_e = (
        f"array_join(transform(filter(array({elems}), "
        f"x -> length(x) > {minlen}), x -> {lam}), ',')"
    )
    duck_e = (
        f"COALESCE(array_to_string(list_transform(list_filter([{elems}], "
        f"x -> length(x) > {minlen}), x -> {lam}), ','), '')"
    )
    return spark_e, duck_e


def test_higher_order_fold_grammar(frames):
    """Random integer folds — plain and over sorted arrays — must walk
    identical accumulator trajectories in both engines. This is the
    grammar the engine's ordered-fold operators (EWMA, BM25, Holt,
    Kaplan-Meier) are built from."""
    rng = random.Random(515151)
    specs = [_fold_spec(rng, sort=False) for _ in range(25)] + [
        _fold_spec(rng, sort=True) for _ in range(15)
    ]
    _run_batch_paired(frames, [s for s, _ in specs], [d for _, d in specs])


def test_higher_order_transform_filter_grammar(frames):
    """transform/filter/join pipelines over string arrays agree."""
    rng = random.Random(616161)
    specs = [_transform_spec(rng) for _ in range(30)]
    _run_batch_paired(frames, [s for s, _ in specs], [d for _, d in specs])


def test_empty_list_join_dialect_boundary(frames):
    """Found by the paired HOF fuzzer: joining an EMPTY list is '' in
    Spark (array_join) but NULL in DuckDB (array_to_string). Pinned so
    oracle authors know to COALESCE when a filtered list can drain."""
    spark, con = frames
    s = spark.sql(
        "SELECT array_join(filter(array('a'), x -> length(x) > 5), ',')"
    ).collect()[0][0]
    d = con.execute(
        "SELECT array_to_string(list_filter(['a'], x -> length(x) > 5), ',')"
    ).fetchone()[0]
    assert s == "" and d is None
