"""SQL-text query surface: the engine's ``spark.sql`` entry path.

The reference's only SQL runs on Athena (notebook cell 7); our engine
exposes the same capability through Catalyst. These queries are
deliberately written as SQL strings over registered views (not the
DataFrame API) to exercise the parser → analyzer → optimizer path,
including rewrites the DataFrame API rarely triggers: correlated scalar
subqueries, NOT EXISTS anti-joins, scalar subqueries in predicates, and
ROLLUP grouping sets. Each string doubles as its own DuckDB oracle where
dialects agree; where they differ, the oracle variant is given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views

# q2-style: cheapest part per type (correlated scalar subquery ->
# Catalyst RewriteCorrelatedScalarSubquery + left-semi style plan)
CHEAPEST_PART_SQL = """
SELECT p_type, p_partkey, p_name, p_retailprice
FROM part p
WHERE p_retailprice = (SELECT MIN(p2.p_retailprice)
                       FROM part p2 WHERE p2.p_type = p.p_type)
"""

# q22-style: well-funded customers with no orders (scalar subquery in a
# predicate + NOT EXISTS anti-join)
IDLE_RICH_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
"""

# q13-style: order-count distribution over a LEFT OUTER join
ORDER_COUNT_DISTRIBUTION_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""

# ROLLUP over the order hierarchy (grouping sets path). Spark and DuckDB
# both emit NULL for rolled-up levels; counts/sums are exact ints.
# Spark spells the string type STRING, DuckDB VARCHAR — one template,
# substituted per dialect
_ROLLUP_TEMPLATE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS {STR}) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""
ORDERS_ROLLUP_SQL = _ROLLUP_TEMPLATE.format(STR="STRING")
ORDERS_ROLLUP_ORACLE = _ROLLUP_TEMPLATE.format(STR="VARCHAR")

# exact percentiles: Spark percentile() and DuckDB quantile_cont() both
# use linear interpolation; values verified bit-equal on this data.
#
# Round-11 execution form: percentile() buffers EVERY group value in an
# ObjectHashAggregate ArrayBuffer (no codegen, no graceful spill) and
# ships them all to one reducer per group. The window-pick form below
# sorts within the group partition (external sort — spills instead of
# OOM at scale), keeps only the 4 bracketing order statistics, and
# interpolates with the IDENTICAL double sequence Spark's Percentile
# uses: pos = p*(n-1); (ceil(pos)-pos)*v_lo + (pos-floor(pos))*v_hi.
# Measured 1.47 s -> 0.66 s at sf0.1, results bit-identical (and the
# DuckDB quantile_cont oracle is unchanged). l_extendedprice is
# NOT NULL in the schema — the rank positions assume no null values.
def _pick(p: str, col: str = "v") -> str:
    lo = f"CAST(FLOOR({p}D*(n-1)) AS BIGINT)+1"
    hi = f"CAST(CEIL({p}D*(n-1)) AS BIGINT)+1"
    vlo = f"MAX(CASE WHEN rn = {lo} THEN {col} END)"
    vhi = f"MAX(CASE WHEN rn = {hi} THEN {col} END)"
    pos = f"({p}D*(MAX(n)-1))"
    return (
        f"CASE WHEN CEIL({pos}) = FLOOR({pos}) THEN {vlo} "
        f"ELSE (CEIL({pos}) - {pos}) * {vlo}"
        f" + ({pos} - FLOOR({pos})) * {vhi} END"
    )


_SPARK_QUANTILES = f"""
WITH ranked AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
picks AS (
  SELECT l_returnflag, n, rn, v FROM ranked
  WHERE rn IN (CAST(FLOOR(0.5D*(n-1)) AS BIGINT)+1,
               CAST(CEIL(0.5D*(n-1)) AS BIGINT)+1,
               CAST(FLOOR(0.95D*(n-1)) AS BIGINT)+1,
               CAST(CEIL(0.95D*(n-1)) AS BIGINT)+1)
)
SELECT l_returnflag,
       {_pick('0.5')} AS median_price,
       {_pick('0.95')} AS p95_price,
       CAST(COALESCE(MAX(n), 0) AS BIGINT) AS n_rows
FROM picks
GROUP BY l_returnflag
"""
_DUCKDB_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""

# Scale path for the exact-percentile query above: percentile() buffers
# every group value (ObjectHashAggregate) — memory grows with group
# size, which spills/OOMs at 100 TB. approx_percentile uses a
# KLL/GK-style bounded sketch: fixed memory per group, mergeable
# map-side, one shuffle of sketch bytes. Sketches are engine-specific
# ⇒ no cross-engine value oracle (rows-only driver check); accuracy vs
# the exact query is unit-tested (tests/test_scale_patterns.py).
_SPARK_QUANTILES_APPROX = """
SELECT l_returnflag,
       approx_percentile(l_extendedprice, 0.5, 10000) AS median_price,
       approx_percentile(l_extendedprice, 0.95, 10000) AS p95_price,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def _sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


# NOT IN with a nullable subquery — the classic three-valued-logic trap:
# if the subquery produced any NULL, NOT IN yields no rows at all. Both
# engines implement the same ANSI semantics; the predicate guards nulls
# explicitly the way production queries should.
PARTS_NO_CHEAP_ORDER_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem
  WHERE l_extendedprice < 2000.0 AND l_partkey IS NOT NULL
)
  AND p_retailprice > 915.0
"""


# CUBE over two dims (all four grouping sets)
ORDERS_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

# EXCEPT set op: nations with customers but no well-capitalized supplier
NATIONS_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 7000.0
"""

# INTERSECT set op (the distinct-semantics twin of EXCEPT): nations with
# BOTH customers and a well-capitalized supplier
NATIONS_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 7000.0
"""

# q11-style: parts whose revenue exceeds a fixed fraction of TOTAL revenue
# — an aggregate filtered against an uncorrelated scalar subquery over the
# same fact table. Catalyst plans the subquery as an independent
# one-row aggregate broadcast into the filter; the fact scans share the
# exchange under AQE. The threshold multiply happens in double on both
# engines after the exact-decimal sum (IEEE-identical). STRING/VARCHAR is
# the one dialect split — one template, substituted per engine.
_PART_REVENUE_SHARE_TEMPLATE = """
WITH pr AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS {STR}) AS DOUBLE)
           AS part_rev
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, part_rev
FROM pr
WHERE part_rev > (
  SELECT 0.0008 * CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS {STR})
                    AS DOUBLE)
  FROM lineitem
)
"""
PART_REVENUE_SHARE_SQL = _PART_REVENUE_SHARE_TEMPLATE.format(STR="STRING")
PART_REVENUE_SHARE_ORACLE = _PART_REVENUE_SHARE_TEMPLATE.format(STR="VARCHAR")

# Explicit GROUPING SETS with the GROUPING() marker function — the
# general grouping-sets surface beyond ROLLUP/CUBE sugar; GROUPING()
# disambiguates a rolled-up NULL from a data NULL (both engines emit
# the same markers).
ORDERS_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

# LATERAL correlated subquery with ORDER BY + LIMIT: per-nation top-2
# customers by balance. Exercises the correlated-rewrite machinery
# (DomainJoin in Catalyst) rather than a window function; deterministic
# tiebreak on c_custkey keeps the LIMIT stable in both engines.
NATION_TOP_CUSTOMERS_SQL = """
SELECT n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
) t
"""

# String-function surface: tokenize part names (split+explode), group by
# word, edit-distance against a fixed probe. levenshtein() is the same
# integer DP in both engines; split on a literal space and COUNT are
# dialect-identical. One dialect split: Spark's split() takes a regex,
# DuckDB's string_split a literal — same result for ' '.
_PART_WORDS_TEMPLATE = """
SELECT word,
       COUNT(*) AS n_parts,
       CAST(levenshtein(word, 'widget') AS BIGINT) AS dist_widget
FROM (SELECT {SPLIT} AS word FROM part)
GROUP BY word
"""
PART_WORDS_SQL = _PART_WORDS_TEMPLATE.format(
    SPLIT="explode(split(p_name, ' '))"
)
PART_WORDS_ORACLE = _PART_WORDS_TEMPLATE.format(
    SPLIT="unnest(string_split(p_name, ' '))"
)

# Closed-form per-group OLS (n_chars ~ n_tokens per source) from pure
# INTEGER sums — the sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
# exact int64 on both engines (token counts ~5e2, docs ~5e3 per group:
# far from overflow), so slope/intercept computed from them in double
# are bit-identical with no decimal staging. This is the "aggregate
# the sufficient statistics, finish the math on the reduced row" shape
# that replaces per-group model fits at scale — one shuffle, no UDF.
_REGRESSION_TEMPLATE = """
WITH feats AS (
  SELECT source,
         CAST({NTOK} AS BIGINT) AS x,
         CAST(length(text) AS BIGINT) AS y
  FROM documents
),
stats AS (
  SELECT source,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM feats GROUP BY source
)
SELECT source, n AS n_docs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM stats
"""
REGRESSION_SQL = _REGRESSION_TEMPLATE.format(
    NTOK="size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
)
REGRESSION_ORACLE = _REGRESSION_TEMPLATE.format(
    NTOK="len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
)


# q21-shape: suppliers whose LATE line (ship > order date + 60 days) is
# the ONLY late line of a multi-supplier finished order. Exercises the
# two hardest subquery rewrites together: a correlated EXISTS with an
# inequality on the same fact table (self-correlation, l2 <> l1) and a
# correlated NOT EXISTS whose predicate references TWO outer tables
# (l1's orderkey AND o's orderdate) — Catalyst plans left-semi +
# left-anti joins with compound correlated conditions. The testdata has
# no commit/receipt dates, so "late" is defined against o_orderdate
# (TPC-H q21 proper uses l_receiptdate > l_commitdate).
SUPPLIER_WAITS_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name LIKE 'NATION_1%'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""

# q16-shape: distinct-supplier counts per part type, excluding
# blacklisted suppliers via NOT IN (lineitem stands in for partsupp —
# the testdata ships no partsupp table). COUNT(DISTINCT) over a join +
# a negated uncorrelated subquery in one block.
PART_SUPPLIER_COUNTS_SQL = """
SELECT p_type, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_type <> 'STANDARD'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0.0)
GROUP BY p_type
"""

# q20-shape: nested IN chain with an aggregate HAVING — suppliers who
# moved > 400 units of widget-family parts. IN (... IN (...) GROUP BY
# HAVING) forces the semi-join-over-aggregate rewrite path.
WIDGET_SUPPLIERS_SQL = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '%widget%')
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 400.0
)
"""


QUERIES = {
    "sql_cheapest_part_per_type": _sql_query(CHEAPEST_PART_SQL),
    "sql_idle_rich_customers": _sql_query(IDLE_RICH_CUSTOMERS_SQL),
    "sql_order_count_distribution": _sql_query(ORDER_COUNT_DISTRIBUTION_SQL),
    "sql_orders_rollup": _sql_query(ORDERS_ROLLUP_SQL),
    "sql_price_quantiles": _sql_query(_SPARK_QUANTILES),
    "sql_price_quantiles_approx": _sql_query(_SPARK_QUANTILES_APPROX),
    "sql_parts_no_cheap_order": _sql_query(PARTS_NO_CHEAP_ORDER_SQL),
    "sql_orders_cube": _sql_query(ORDERS_CUBE_SQL),
    "sql_nations_except": _sql_query(NATIONS_EXCEPT_SQL),
    "sql_nations_intersect": _sql_query(NATIONS_INTERSECT_SQL),
    "sql_part_revenue_share": _sql_query(PART_REVENUE_SHARE_SQL),
    "sql_part_words": _sql_query(PART_WORDS_SQL),
    "sql_regression_by_source": _sql_query(REGRESSION_SQL),
    "sql_orders_grouping_sets": _sql_query(ORDERS_GROUPING_SETS_SQL),
    "sql_nation_top_customers": _sql_query(NATION_TOP_CUSTOMERS_SQL),
    "sql_supplier_waits": _sql_query(SUPPLIER_WAITS_SQL),
    "sql_part_supplier_counts": _sql_query(PART_SUPPLIER_COUNTS_SQL),
    "sql_widget_suppliers": _sql_query(WIDGET_SUPPLIERS_SQL),
}

ORACLES = {
    "sql_cheapest_part_per_type": CHEAPEST_PART_SQL,
    "sql_idle_rich_customers": IDLE_RICH_CUSTOMERS_SQL,
    "sql_order_count_distribution": ORDER_COUNT_DISTRIBUTION_SQL,
    "sql_orders_rollup": ORDERS_ROLLUP_ORACLE,
    "sql_price_quantiles": _DUCKDB_QUANTILES,
    "sql_parts_no_cheap_order": PARTS_NO_CHEAP_ORDER_SQL,
    "sql_orders_cube": ORDERS_CUBE_SQL,
    "sql_nations_except": NATIONS_EXCEPT_SQL,
    "sql_nations_intersect": NATIONS_INTERSECT_SQL,
    "sql_part_revenue_share": PART_REVENUE_SHARE_ORACLE,
    "sql_part_words": PART_WORDS_ORACLE,
    "sql_regression_by_source": REGRESSION_ORACLE,
    "sql_orders_grouping_sets": ORDERS_GROUPING_SETS_SQL,
    "sql_nation_top_customers": NATION_TOP_CUSTOMERS_SQL,
    "sql_supplier_waits": SUPPLIER_WAITS_SQL,
    "sql_part_supplier_counts": PART_SUPPLIER_COUNTS_SQL,
    "sql_widget_suppliers": WIDGET_SUPPLIERS_SQL,
}
