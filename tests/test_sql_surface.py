"""SQL front door: operator views compose under spark.sql and stay
optimizer-transparent; UDTF table functions handle dynamic arity."""

from __future__ import annotations

from spot_anomalies_flink_workshop_resources_spark import sql_surface


def test_sql_composes_over_operator_views(spark, sf_dir):
    # join two OPERATOR views (LM scores x quality) in plain SQL
    out = sql_surface.sql(
        spark,
        sf_dir,
        """
        SELECT q.doc_id, q.quality_score, s.avg_nll
        FROM doc_quality q
        JOIN doc_lm_scores s ON s.doc_id = q.doc_id
        WHERE q.quality_score >= 0.5
        ORDER BY s.avg_nll DESC
        LIMIT 5
        """,
    ).collect()
    assert len(out) == 5
    assert all(r.quality_score >= 0.5 for r in out)
    # descending perplexity order
    nlls = [r.avg_nll for r in out]
    assert nlls == sorted(nlls, reverse=True)


def test_view_predicate_pushes_into_scan(spark, sf_dir):
    """A filter written OUTSIDE the view must reach the parquet scan
    inside the operator plan — temp views are logical plans, not
    materialization walls."""
    sql_surface.register_operator_views(spark, sf_dir)
    df = spark.sql(
        "SELECT * FROM events_dense_hourly WHERE event_type = 'click'"
    )
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in p
    pushed = p.split("PushedFilters")[1][:200]
    assert "event_type" in pushed, pushed


def test_chunk_text_udtf_lateral_join(spark, sf_dir):
    out = sql_surface.sql(
        spark,
        sf_dir,
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens
        FROM (SELECT * FROM documents WHERE doc_id < 3) d,
        LATERAL chunk_text(d.text, 10, 5) c
        """,
    ).collect()
    assert len(out) > 3
    # stride 5 < window 10: consecutive chunks overlap; every full
    # chunk has exactly `window` tokens
    full = [r for r in out if r.n_tokens == 10]
    assert full
    # chunk ids dense from 0 per doc
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_id)
    for ids in by_doc.values():
        assert sorted(ids) == list(range(len(ids)))


def test_chunk_text_udtf_guards(spark, sf_dir):
    sql_surface.register_table_functions(spark)
    # stride > window or empty text: no rows, no error
    assert spark.sql("SELECT * FROM chunk_text('a b c', 2, 5)").count() == 0
    assert spark.sql("SELECT * FROM chunk_text('', 4, 2)").count() == 0
