"""SQL surface for the engine's operators: views + table functions.

The reference exposes its one relational capability through Athena SQL
(NB cell 7); this module gives the ENGINE's operators the same kind of
SQL front door, the idiomatic-Spark way:

- **Operator views** (`register_operator_views`): each flagship
  operator result is registered as a TEMP VIEW. A temp view is a
  LOGICAL PLAN, not a materialization — `spark.sql` queries compose
  over it and Catalyst optimizes THROUGH it (predicates on the view
  push into the operator's own scan; verified by
  `tests/test_sql_surface.py::test_view_predicate_pushes_into_scan`).
- **Table functions** (`register_table_functions`): the genuinely
  dynamic-arity case — parameters arrive per SQL call, so a view
  cannot express it — is served by a Python UDTF
  (`chunk_text(text, window, stride)`). UDTFs are row-at-a-time
  Python and deliberately NOT used by any engine hot path (those stay
  JVM expressions / Arrow-batched); the registration exists for SQL
  ergonomics on small/dim-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .catalog import load_table, register_views

# view name -> registry query it exposes
OPERATOR_VIEWS: dict[str, str] = {
    "attack_runs": "cep_fragmentation",
    "doc_quality": "text_stats",
    "doc_lm_scores": "text_lm_score",
    "dedup_keeps": "dedup_exact",
    "events_dense_hourly": "events_gapfill",
    "funnel_stages": "events_funnel",
}


def register_operator_views(spark: SparkSession, sf_dir: str) -> None:
    """Register base-table views plus one temp view per flagship
    operator; afterwards ``spark.sql`` can select from / join / filter
    them like tables, with full Catalyst optimization through the view
    boundary."""
    from .plans.harness import build_queries

    register_views(spark, sf_dir)
    queries = build_queries()
    for view, qname in OPERATOR_VIEWS.items():
        queries[qname](spark, sf_dir).createOrReplaceTempView(view)


def register_table_functions(spark: SparkSession) -> None:
    """Register SQL-callable table functions (Python UDTFs)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_tokens int, chunk string")
    class ChunkText:
        """Overlapping token windows of one string — the SQL-callable
        twin of operators/chunking.chunk_windows for ad-hoc use:
        SELECT c.* FROM documents, LATERAL chunk_text(text, 24, 16) c.
        """

        def eval(self, text: str, window: int, stride: int):
            if not text or window <= 0 or stride <= 0 or stride > window:
                return
            toks = text.split()
            i = 0
            cid = 0
            while i < len(toks):
                piece = toks[i : i + window]
                yield cid, len(piece), " ".join(piece)
                if i + window >= len(toks):
                    break
                i += stride
                cid += 1

    spark.udtf.register("chunk_text", ChunkText)


def sql(spark: SparkSession, sf_dir: str, query: str):
    """One-call SQL entry point: ensure views + functions, run query."""
    register_operator_views(spark, sf_dir)
    register_table_functions(spark)
    return spark.sql(query)
