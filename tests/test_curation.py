"""Third-wave curation/eval operators: boilerplate detection, NDCG
retrieval eval, join-fanout DQ profile (plans/curation.py)."""

import math

import pytest
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.plans import curation

SF_DIR = "/root/testdata/sf0.001"


def test_boilerplate_shares_bounded_and_flag_consistent(spark):
    rows = curation.corpus_boilerplate(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.boiler_share <= 1.0
        assert r.boiler_positions <= r.gram_positions
        assert r.boiler_grams >= 0
        # share is exactly the flagged-position fraction
        if r.gram_positions:
            assert r.boiler_share == pytest.approx(
                r.boiler_positions / r.gram_positions
            )


def test_boilerplate_gate_matches_bruteforce_python(spark):
    """Recompute one source's flags with pure Python over the raw text."""
    import re

    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("source") == "src0")
        .select("doc_id", "text")
        .collect()
    )
    df = {}
    positions = 0
    for r in d:
        toks = re.findall("[a-z0-9]+", r.text.lower())
        grams = [
            " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
        ] if len(toks) >= 5 else []
        positions += len(grams)
        for g in set(grams):
            df[g] = df.get(g, 0) + 1
    n_docs = len(d)
    boiler = {g for g, c in df.items() if c * 20 > n_docs}
    row = [
        r
        for r in curation.corpus_boilerplate(spark, SF_DIR).collect()
        if r.source == "src0"
    ][0]
    assert row.n_docs == n_docs
    assert row.boiler_grams == len(boiler)
    assert row.gram_positions == positions


def test_ndcg_bounded_and_weights_are_log_discounts(spark):
    # the embedded integer weights are exactly round(2^20 / log2(r+1))
    for r, w in enumerate(curation._DCG_W, start=1):
        assert w == round((1 << 20) / math.log2(r + 1))
    rows = curation.simsearch_ndcg(spark, SF_DIR).collect()
    assert len(rows) == 16
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0
        assert r.n_rel >= 0


def test_ndcg_perfect_ranking_scores_one(spark, tmp_path):
    """A space where same-label vectors are identical gives NDCG = 1."""
    import numpy as np

    data = []
    for vid in range(40):
        lbl = vid % 4
        base = np.zeros(8)
        base[lbl] = 1.0
        data.append((vid, [float(x) for x in base], lbl))
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    rows = curation.simsearch_ndcg(spark, str(tmp_path)).collect()
    assert rows and all(r.ndcg == pytest.approx(1.0) for r in rows)


def test_template_strip_matches_bruteforce_python(spark):
    """Token coverage recomputed with a pure-Python interval union."""
    import re

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r)
    expect = {}
    for src, rows in by_src.items():
        df_count = {}
        doc_grams = {}
        for r in rows:
            toks = re.findall("[a-z0-9]+", r.text.lower())
            grams = (
                [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
                if len(toks) >= 5
                else []
            )
            doc_grams[r.doc_id] = (toks, grams)
            for g in set(grams):
                df_count[g] = df_count.get(g, 0) + 1
        boiler = {g for g, c in df_count.items() if c * 20 > len(rows)}
        total = stripped = touched = 0
        for toks, grams in doc_grams.values():
            total += len(toks)
            cov = set()
            for i, g in enumerate(grams):
                if g in boiler:
                    cov.update(range(i, i + 5))
            stripped += len(cov)
            touched += 1 if cov else 0
        expect[src] = (len(rows), touched, total, stripped)
    got = {
        r.source: (r.n_docs, r.docs_touched, r.tokens_total, r.tokens_stripped)
        for r in curation.corpus_template_strip(spark, SF_DIR).collect()
    }
    assert got == expect


def test_order_cycle_percentiles_match_numpy(spark):
    import numpy as np

    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ls = l.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("ship"))
    rows = (
        o.join(ls, o.o_orderkey == ls.l_orderkey)
        .select(
            "o_orderpriority",
            F.datediff(F.to_date("ship"), F.to_date("o_orderdate")).alias(
                "d"
            ),
        )
        .collect()
    )
    by_p = {}
    for r in rows:
        by_p.setdefault(r.o_orderpriority, []).append(r.d)
    got = {
        r.o_orderpriority: r
        for r in curation.sql_order_cycle_percentiles(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_p)
    for p, ds in by_p.items():
        a = np.array(sorted(ds), dtype=float)
        r = got[p]
        assert r.n_orders == len(ds)
        assert r.p50_days == pytest.approx(float(np.percentile(a, 50)))
        assert r.p90_days == pytest.approx(float(np.percentile(a, 90)))
        assert r.p99_days == pytest.approx(float(np.percentile(a, 99)))


def test_entropy_rate_bounded_by_log_successors(spark):
    import math

    rows = curation.events_entropy_rate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # H(next|cur) in [0, log2(#successor types)]
        assert -1e-9 <= r.h_bits <= math.log2(r.n_next_types) + 1e-9
        assert r.n_transitions > 0


def test_cohort_retention_matrix_properties(spark):
    rows = curation.sql_cohort_retention_matrix(spark, SF_DIR).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault((r.cohort_year, r.cohort_month), {})[
            r.offset
        ] = r
    for key, offs in by_cohort.items():
        assert 0 in offs, f"cohort {key} missing offset 0"
        base = offs[0]
        assert base.active == base.cohort_size
        assert base.retention == pytest.approx(1.0)
        for r in offs.values():
            assert r.active <= r.cohort_size
            assert 0.0 < r.retention <= 1.0


def test_split_drift_matches_bruteforce_ks(spark):
    """KS D recomputed from the same deterministic split in Python."""
    import hashlib

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .collect()
    )
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(r)
    train, test = [], []
    for rows in by_lang.values():
        rows.sort(
            key=lambda r: (
                hashlib.md5(str(r.doc_id).encode()).hexdigest(),
                r.doc_id,
            )
        )
        n = len(rows)
        for i, r in enumerate(rows, start=1):
            if i * 10 <= n * 8:
                train.append(r.n_chars)
            elif i * 10 > n * 9:
                test.append(r.n_chars)
    n1, n2 = len(train), len(test)
    xs = sorted(set(train) | set(test))
    c1 = c2 = 0
    st, ss = sorted(train), sorted(test)
    d_num = 0
    import bisect

    for x in xs:
        c1 = bisect.bisect_right(st, x)
        c2 = bisect.bisect_right(ss, x)
        d_num = max(d_num, abs(c1 * n2 - c2 * n1))
    row = curation.corpus_split_drift(spark, SF_DIR).collect()[0]
    assert row.n_train == n1 and row.n_test == n2
    assert row.d_stat == pytest.approx(d_num / (n1 * n2))
    assert row.mean_chars_train == pytest.approx(sum(train) / n1)
    assert row.mean_chars_test == pytest.approx(sum(test) / n2)


def test_price_elasticity_matches_numpy_ols(spark):
    import numpy as np

    rows = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/part.parquet"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_brand", "l_discount", "l_quantity")
        .collect()
    )
    by_b = {}
    for r in rows:
        x = round(r.l_discount * 100)
        by_b.setdefault(r.p_brand, []).append((x, int(r.l_quantity)))
    got = {
        r.p_brand: r
        for r in curation.sql_price_elasticity(spark, SF_DIR).collect()
    }
    for b, pts in by_b.items():
        xs = np.array([p[0] for p in pts], float)
        ys = np.array([p[1] for p in pts], float)
        r = got[b]
        assert r.n_lines == len(pts)
        if xs.std() > 0:
            slope = np.polyfit(xs, ys, 1)[0]
            assert r.qty_per_discount_point == pytest.approx(slope, rel=1e-9)
            if ys.std() > 0:
                cc = np.corrcoef(xs, ys)[0, 1]
                assert r.r2 == pytest.approx(cc * cc, rel=1e-9)


def test_icc_identical_users_scores_near_one(spark, tmp_path):
    """Users with constant (but distinct) values => within-variance 0,
    ICC -> 1."""
    rows = []
    eid = 0
    for u in range(10):
        for _ in range(20):
            rows.append((eid, "2024-01-01 00:00:00", f"u{u}",
                         "click", float(u + 1)))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id string,"
        " event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "'{}' AS props"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = curation.events_icc(spark, str(tmp_path)).collect()[0]
    assert r.ms_within == 0.0
    assert r.icc1 == pytest.approx(1.0)


def test_brier_decomposition_identity(spark):
    """brier_raw == reliability - resolution + uncertainty
    + within_bin_variance (by construction), components sane."""
    r = curation.events_score_brier(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.brier_raw <= 1.0
    assert r.reliability >= 0 and r.resolution >= 0
    assert 0.0 <= r.uncertainty <= 0.25 + 1e-12
    lhs = r.brier_raw
    rhs = (
        r.reliability - r.resolution + r.uncertainty + r.within_bin_variance
    )
    assert lhs == pytest.approx(rhs)


def test_logrank_planted_difference_and_null(spark, tmp_path):
    """Urgent orders shipping much faster => significant; identical
    distributions => chi2 near zero and not significant."""
    import itertools

    def write(tag, urgent_delay, normal_delay):
        orows, lrows = [], []
        oid = itertools.count()
        for i in range(200):
            ok = next(oid)
            urgent = i % 2 == 0
            d = urgent_delay(i) if urgent else normal_delay(i)
            orows.append(
                (ok, i, "O", 10.0, "1997-01-01",
                 "1-URGENT" if urgent else "5-LOW")
            )
            lrows.append(
                (ok, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
                 f"1997-01-{min(d + 1, 28):02d}")
            )
        o = spark.createDataFrame(
            orows, "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string,"
            " o_orderpriority string"
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
        l = spark.createDataFrame(
            lrows, "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber long, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate string"
        ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
        p = f"{tmp_path}/{tag}"
        o.write.mode("overwrite").parquet(f"{p}/orders.parquet")
        l.write.mode("overwrite").parquet(f"{p}/lineitem.parquet")
        return p

    fast = write("diff", lambda i: 1 + (i % 3), lambda i: 15 + (i % 5))
    r = curation.sql_ship_logrank(spark, fast).collect()[0]
    assert r.significant_5pct and r.chi2 > 50
    # i//2 strips the parity that assigns groups, so both groups see
    # the identical delay multiset
    same = write(
        "null", lambda i: 5 + ((i // 2) % 4), lambda i: 5 + ((i // 2) % 4)
    )
    r = curation.sql_ship_logrank(spark, same).collect()[0]
    assert not r.significant_5pct


def test_join_fanout_matches_real_join_counts(spark):
    prof = {
        r.relation: r
        for r in curation.dq_join_fanout(spark, SF_DIR).collect()
    }
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    actual = l.join(o, l.l_orderkey == o.o_orderkey).count()
    r = prof["lineitem->orders"]
    assert r.join_rows == actual
    assert r.child_rows == l.count()
    assert r.orphan_child_rows == l.join(
        o, l.l_orderkey == o.o_orderkey, "left_anti"
    ).count()
    assert r.expansion_ratio == pytest.approx(r.join_rows / r.child_rows)


def test_dsir_select_prefers_target_like_docs(spark, tmp_path):
    """Docs sharing the en subcorpus's vocabulary must outrank docs
    drawn from a disjoint vocabulary, and weights must be descending."""
    en = "data table query scan filter join group sort " * 6
    enish = "data table query scan filter join group sort extra words " * 5
    other = "xylo quark zephyr umbra vortex nimbus " * 8
    rows = [
        (0, en.strip(), "en", "s0"),
        (1, en.strip() + " more", "en", "s0"),
        (2, enish.strip(), "de", "s1"),   # non-en but target-like text
        (3, other.strip(), "de", "s1"),   # disjoint vocabulary
        (4, other.strip() + " unique", "es", "s2"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = curation.corpus_dsir_select(spark, str(tmp_path)).collect()
    weights = {r.doc_id: r.weight for r in out}
    ranked = [r.doc_id for r in out]
    # target-vocabulary docs (0,1,2) all above the disjoint-vocab docs
    assert set(ranked[:3]) == {0, 1, 2}
    assert weights[2] > weights[3]
    # output is sorted by weight desc
    ws = [r.weight for r in out]
    assert ws == sorted(ws, reverse=True)
