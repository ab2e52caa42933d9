"""Data-quality audits: referential-integrity orphan counts.

A pipeline that feeds training jobs (or the reference's Athena scans,
NB cell 7) needs to PROVE its foreign keys resolve before downstream
joins silently drop rows. This operator audits every declared
child->parent relationship in one pass per relationship: total child
rows and orphan rows (foreign key present but unmatched).

Scale design: each relationship is ONE left outer join + one
aggregate — the parent side ships only its key column (column-pruned
scan), small parents broadcast, big-big pairs fall to a co-partitioned
shuffle join; the result is |relationships| rows. NULL foreign keys
are counted separately (a NULL fk is a completeness issue, not an
integrity orphan — SQL semantics would silently drop it from both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, child table, fk, parent table, pk)
TPCH_RELATIONSHIPS: tuple[tuple[str, str, str, str, str], ...] = (
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
)


def referential_integrity(
    load, spark: SparkSession, sf_dir: str, relationships=TPCH_RELATIONSHIPS
) -> DataFrame:
    """Audit rows: (relationship, n_rows, n_null_fk, n_orphans).

    ``load`` is the table loader ``(spark, sf_dir, name) -> DataFrame``
    (catalog.load_table), injected so the operator stays
    catalog-agnostic.
    """
    out = None
    for name, child_t, fk, parent_t, pk in relationships:
        child = load(spark, sf_dir, child_t).select(F.col(fk))
        parent = load(spark, sf_dir, parent_t).select(
            F.col(pk).alias("__pk")
        ).distinct()
        joined = child.join(parent, F.col(fk) == F.col("__pk"), "left")
        row = joined.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count(F.when(F.col(fk).isNull(), 1)).cast("long").alias("n_null_fk"),
            F.count(
                F.when(F.col(fk).isNotNull() & F.col("__pk").isNull(), 1)
            ).cast("long").alias("n_orphans"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def referential_integrity_sql(relationships=TPCH_RELATIONSHIPS) -> str:
    parts = []
    for name, child_t, fk, parent_t, pk in relationships:
        parts.append(
            f"""SELECT '{name}' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN c.{fk} IS NULL THEN 1 END) AS BIGINT)
         AS n_null_fk,
       CAST(COUNT(CASE WHEN c.{fk} IS NOT NULL AND p.__pk IS NULL THEN 1 END)
            AS BIGINT) AS n_orphans
FROM {child_t} c
LEFT JOIN (SELECT DISTINCT {pk} AS __pk FROM {parent_t}) p
  ON c.{fk} = p.__pk"""
        )
    return "\nUNION ALL\n".join(parts)
