"""Randomized cross-checks for the third-wave curation/eval operators:
each query re-derived by an independent pure-Python reference on seeded
random fixtures (the multi-seed strategy of test_insights_random.py).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spot_anomalies_flink_workshop_resources_spark.plans import curation as C

from test_insights import _events, _write

_Q = 1 << 20


def _rand_events(seed, n=300, types=("a", "b", "error"), users=(1, 2, 3, 4)):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        d, h, m = rng.randint(1, 27), rng.randint(0, 23), rng.randint(0, 59)
        rows.append(
            (i, f"2024-03-{d:02d} {h:02d}:{m:02d}:00", rng.choice(users),
             rng.choice(types), round(rng.uniform(1, 99), 2))
        )
    return rows


@pytest.mark.parametrize("seed", [5, 19, 83])
def test_entropy_rate_matches_python(spark, tmp_path, seed):
    rows = _rand_events(seed)
    sf = _events(spark, tmp_path, rows)
    # python reference with the SAME quantization
    by_user = {}
    for i, ts, u, t, v in rows:
        by_user.setdefault(u, []).append((ts, i, t))
    trans = {}
    for seq in by_user.values():
        seq.sort()
        for (_ts1, _i1, prev), (_ts2, _i2, nxt) in zip(seq, seq[1:]):
            trans[(prev, nxt)] = trans.get((prev, nxt), 0) + 1
    tot = {}
    for (p, _), n in trans.items():
        tot[p] = tot.get(p, 0) + n
    want = {}
    for p, ni in tot.items():
        hq = sum(
            math.floor(n * math.log(ni / n) * _Q + 0.5)
            for (pp, _), n in trans.items()
            if pp == p
        )
        want[p] = hq / (ni * _Q) / math.log(2)
    got = {
        r.prev_type: r for r in C.events_entropy_rate(spark, sf).collect()
    }
    assert set(got) == set(want)
    for p in want:
        assert got[p].h_bits == pytest.approx(want[p], abs=1e-12)
        assert got[p].n_transitions == tot[p]


@pytest.mark.parametrize("seed", [7, 31, 101])
def test_icc_matches_python_exact_formula(spark, tmp_path, seed):
    rows = _rand_events(seed)
    sf = _events(spark, tmp_path, rows)
    groups = {}
    for i, ts, u, t, v in rows:
        groups.setdefault(u, []).append(round(v * 100))
    k = len(groups)
    nn = sum(len(g) for g in groups.values())
    s = sum(sum(g) for g in groups.values())
    ssb_num = sum((sum(g) * sum(g)) // len(g) for g in groups.values())
    sn2 = sum(len(g) ** 2 for g in groups.values())
    scc = sum(c * c for g in groups.values() for c in g)
    msb = (ssb_num - s / nn * s) / (k - 1)
    msw = (scc - ssb_num) / (nn - k)
    n0 = (nn - sn2 / nn) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    r = C.events_icc(spark, sf).collect()[0]
    assert r.n_users == k and r.n_events == nn
    assert r.ms_between == pytest.approx(msb, rel=1e-12)
    assert r.ms_within == pytest.approx(msw, rel=1e-12)
    assert r.icc1 == pytest.approx(icc, rel=1e-9)


@pytest.mark.parametrize("seed", [13, 43, 97])
def test_brier_matches_python(spark, tmp_path, seed):
    rows = _rand_events(seed)
    sf = _events(spark, tmp_path, rows)
    cs = [(round(v * 100), 1 if t == "error" else 0)
          for _, _, _, t, v in rows]
    mn, mx = min(c for c, _ in cs), max(c for c, _ in cs)
    r_ = mx - mn
    nn = len(cs)
    sqsum = sum(((c - mn) - o * r_) ** 2 for c, o in cs)
    brier = sqsum / (nn * r_ * r_)
    bins = {}
    for c, o in cs:
        b = ((c - mn) * 10) // (mx - mn + 1)
        n, ss, np_ = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, ss + (c - mn), np_ + o)
    p = sum(o for _, o in cs)
    rel_q = sum(
        math.floor((ss - np_ * r_) ** 2 / (n * r_ * r_) * _Q + 0.5)
        for n, ss, np_ in bins.values()
    )
    res_q = sum(
        math.floor((np_ * nn - n * p) ** 2 / (n * nn * nn) * _Q + 0.5)
        for n, ss, np_ in bins.values()
    )
    row = C.events_score_brier(spark, sf).collect()[0]
    assert row.n_events == nn
    assert row.brier_raw == pytest.approx(brier, rel=1e-12)
    assert row.reliability == pytest.approx(rel_q / (nn * _Q), rel=1e-12)
    assert row.resolution == pytest.approx(res_q / (nn * _Q), rel=1e-12)
    obar = p / nn
    assert row.uncertainty == pytest.approx(obar * (1 - obar), rel=1e-12)


@pytest.mark.parametrize("seed", [3, 59, 71])
def test_cohort_retention_matches_python(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = []
    for ok in range(120):
        ck = rng.randint(1, 25)
        y, m, d = rng.randint(2023, 2024), rng.randint(1, 12), rng.randint(1, 28)
        rows.append(
            Row(o_orderkey=ok, o_custkey=ck, o_orderstatus="O",
                o_totalprice=10.0, o_orderdate=f"{y}-{m:02d}-{d:02d}",
                o_orderpriority="1-URGENT")
        )
    df = spark.createDataFrame(rows).withColumn(
        "o_orderdate", F.col("o_orderdate").cast("timestamp")
    )
    _write(df, tmp_path, "orders")
    # python reference
    cust = {}
    for r in rows:
        y, m, _ = r.o_orderdate.split("-")
        mi = int(y) * 12 + int(m) - 1
        cust.setdefault(r.o_custkey, []).append(mi)
    act = {}
    for ck, ms in cust.items():
        m0 = min(ms)
        for m in set(ms):
            off = m - m0
            if off <= 11:
                act.setdefault((m0, off), set()).add(ck)
    got = {
        ((r.cohort_year * 12 + r.cohort_month - 1), r.offset): r
        for r in C.sql_cohort_retention_matrix(spark, str(tmp_path)).collect()
    }
    # labels decode the 0-based index cleanly: Dec stays in its year
    for r in C.sql_cohort_retention_matrix(spark, str(tmp_path)).collect():
        assert 1 <= r.cohort_month <= 12
        assert 2023 <= r.cohort_year <= 2024
    assert set(got) == set(act)
    for key, members in act.items():
        base = len(act[(key[0], 0)])
        assert got[key].active == len(members)
        assert got[key].cohort_size == base
        assert got[key].retention == pytest.approx(len(members) / base)


@pytest.mark.parametrize("seed", [17, 37, 89])
def test_elasticity_matches_python_sufficient_stats(spark, tmp_path, seed):
    rng = random.Random(seed)
    lrows, prows = [], []
    for pk in range(1, 11):
        prows.append(
            Row(p_partkey=pk, p_name="n", p_brand=f"B{pk % 3}",
                p_type="t", p_size=1, p_retailprice=1.0)
        )
    for i in range(200):
        pk = rng.randint(1, 10)
        lrows.append(
            Row(l_orderkey=i, l_partkey=pk, l_suppkey=1, l_linenumber=1,
                l_quantity=float(rng.randint(1, 50)),
                l_extendedprice=100.0,
                l_discount=round(rng.randint(0, 10) / 100, 2),
                l_tax=0.0, l_returnflag="N", l_linestatus="O",
                l_shipdate="1997-01-01")
        )
    _write(spark.createDataFrame(prows), tmp_path, "part")
    _write(
        spark.createDataFrame(lrows).withColumn(
            "l_shipdate", F.col("l_shipdate").cast("timestamp")
        ),
        tmp_path,
        "lineitem",
    )
    stats = {}
    pk2b = {p.p_partkey: p.p_brand for p in prows}
    for r in lrows:
        b = pk2b[r.l_partkey]
        x = round(r.l_discount * 100)
        y = int(r.l_quantity)
        n, sx, sxx, sy, syy, sxy = stats.get(b, (0,) * 6)
        stats[b] = (n + 1, sx + x, sxx + x * x, sy + y, syy + y * y,
                    sxy + x * y)
    got = {
        r.p_brand: r
        for r in C.sql_price_elasticity(spark, str(tmp_path)).collect()
    }
    for b, (n, sx, sxx, sy, syy, sxy) in stats.items():
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        r = got[b]
        assert r.n_lines == n
        if dx > 0:
            assert r.qty_per_discount_point == pytest.approx(
                (n * sxy - sx * sy) / dx
            )
            if dy > 0:
                assert r.r2 == pytest.approx(
                    (n * sxy - sx * sy) ** 2 / (dx * dy)
                )


@pytest.mark.parametrize("seed", [41, 53, 67])
def test_ndcg_matches_python_replay(spark, tmp_path, seed):
    """Full integer-grid NDCG replay: quantize unit vectors, integer
    dot products, rank with vec_id tiebreaks, integer DCG weights."""
    rng = random.Random(seed)
    dim, n = 16, 60
    rows = []
    for vid in range(n):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append(Row(vec_id=vid, embedding=[float(x) for x in v],
                        label=rng.randint(0, 3)))
    df = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    _write(df, tmp_path, "embeddings")
    # python replay — float32 storage first, like the parquet round-trip
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    U = {}
    for r in rows:
        e = [f32(x) for x in r.embedding]
        nrm = math.sqrt(sum((float(x)) * float(x) for x in e)) or 1.0
        U[r.vec_id] = [math.floor(float(x) / nrm * _Q + 0.5) for x in e]
    labels = {r.vec_id: r.label for r in rows}
    W = [round(_Q / math.log2(rk + 1)) for rk in range(1, 11)]
    CW = [sum(W[: k + 1]) for k in range(10)]
    lbl_n = {}
    for l in labels.values():
        lbl_n[l] = lbl_n.get(l, 0) + 1
    want = {}
    for q in sorted(U)[:16]:
        scored = sorted(
            ((sum(a * b for a, b in zip(U[q], U[v])), v)
             for v in U if v != q),
            key=lambda p: (-p[0], p[1]),
        )[:10]
        dcg = sum(
            W[rk]
            for rk, (_, v) in enumerate(scored)
            if labels[v] == labels[q]
        )
        n_rel = lbl_n[labels[q]] - 1
        want[q] = (
            dcg / CW[min(n_rel, 10) - 1] if n_rel >= 1 else 0.0,
            n_rel,
        )
    got = {
        r.query_id: (r.ndcg, r.n_rel)
        for r in C.simsearch_ndcg(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(want)
    for q in want:
        assert got[q][1] == want[q][1]
        assert got[q][0] == pytest.approx(want[q][0], abs=1e-12)


@pytest.mark.parametrize("seed", [23, 47, 73])
def test_adf_flags_mean_reversion_not_random_walk(spark, tmp_path, seed):
    """A strongly mean-reverting series flags stationary; a random walk
    doesn't; t2 matches a pure-Python replay on the same integer
    sufficient statistics."""
    from spot_anomalies_flink_workshop_resources_spark.plans import (
        stattests as S,
    )

    rng = random.Random(seed)
    rows, i = [], 0
    walk = 5000.0
    for d in range(1, 121):
        dd = f"2024-{(d - 1) // 28 + 1:02d}-{(d - 1) % 28 + 1:02d}"
        # 'mr': strong mean reversion around 50; 'rw': random walk
        mr = 50.0 + rng.uniform(-20, 20)
        walk += rng.uniform(-3, 3)
        for t, v in (("mr", mr), ("rw", walk)):
            rows.append((i, f"{dd} 12:00:00", 1, t, round(v, 2)))
            i += 1
    sf = _events(spark, tmp_path, rows)
    got = {r.event_type: r for r in S.events_adf(spark, sf).collect()}
    assert got["mr"].stationary_5pct
    assert got["mr"].gamma < 0
    assert not got["rw"].stationary_5pct
    # python replay of the rational t² for the mean-reverting series
    daily = {}
    for _i, ts, _u, t, v in rows:
        if t != "mr":
            continue
        daily.setdefault(ts[:10], 0)
        daily[ts[:10]] += round(v * 100)
    ys = [daily[k] for k in sorted(daily)]
    y0 = min(ys)
    ys = [y - y0 for y in ys]
    xs, zs = ys[:-1], [b - a for a, b in zip(ys, ys[1:])]
    n = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sz, szz = sum(zs), sum(z * z for z in zs)
    sxz = sum(x * z for x, z in zip(xs, zs))
    cxx = sxx - sx * sx / n
    czz = szz - sz * sz / n
    cxz = sxz - sx * sz / n
    t2 = cxz * cxz * (n - 2) / (cxx * czz - cxz * cxz)
    assert got["mr"].t_stat == pytest.approx(-math.sqrt(t2), rel=1e-9)


@pytest.mark.parametrize("seed", [11, 31, 59])
def test_pacf_matches_statsmodels_free_python(spark, tmp_path, seed):
    """Durbin-Levinson replay in Python over the same exact ACF."""
    from spot_anomalies_flink_workshop_resources_spark.plans import (
        stattests as S,
    )

    rng = random.Random(seed)
    rows, i = [], 0
    prev = 50.0
    for d in range(1, 90):
        dd = f"2024-{(d - 1) // 28 + 1:02d}-{(d - 1) % 28 + 1:02d}"
        prev = 0.6 * prev + rng.uniform(5, 40)  # AR(1)-ish
        rows.append((i, f"{dd} 12:00:00", 1, "a", round(prev, 2)))
        i += 1
    sf = _events(spark, tmp_path, rows)
    r = {q.event_type: q for q in S.events_pacf(spark, sf).collect()}["a"]
    # python replay
    daily = {}
    for _i, ts, _u, _t, v in rows:
        daily[ts[:10]] = daily.get(ts[:10], 0) + round(v * 100)
    days = sorted(daily)
    ys = [daily[k] for k in days]
    n, s = len(ys), sum(ys)
    dev = {d_: n * y - s for d_, y in zip(days, ys)}
    den = sum(v * v for v in dev.values())
    rr = {}
    for lag in (1, 2, 3):
        # the engine joins on CALENDAR day d + lag, not row offset
        num = sum(
            dev[a] * dev[b]
            for a in days
            for b in [_day_plus(a, lag)]
            if b in dev
        )
        rr[lag] = num / den
    phi11 = rr[1]
    phi22 = (rr[2] - rr[1] ** 2) / (1 - rr[1] ** 2)
    phi21 = rr[1] * (1 - phi22)
    phi33 = (rr[3] - phi21 * rr[2] - phi22 * rr[1]) / (
        1 - phi21 * rr[1] - phi22 * rr[2]
    )
    assert r.pacf1 == pytest.approx(phi11, rel=1e-12)
    assert r.pacf2 == pytest.approx(phi22, rel=1e-12)
    assert r.pacf3 == pytest.approx(phi33, rel=1e-12)


def _day_plus(day: str, lag: int) -> str:
    import datetime

    d = datetime.date.fromisoformat(day) + datetime.timedelta(days=lag)
    return d.isoformat()


@pytest.mark.parametrize("seed", [19, 43, 89])
def test_ljung_box_flags_ar_not_iid(spark, tmp_path, seed):
    """AR(1) series flags autocorrelated; iid noise (usually) doesn't;
    Q matches the quantized Python replay exactly."""
    from spot_anomalies_flink_workshop_resources_spark.plans import (
        stattests as S,
    )

    rng = random.Random(seed)
    rows, i = [], 0
    prev = 50.0
    for d in range(1, 90):
        dd = f"2024-{(d - 1) // 28 + 1:02d}-{(d - 1) % 28 + 1:02d}"
        prev = 0.7 * prev + rng.uniform(5, 30)
        rows.append((i, f"{dd} 12:00:00", 1, "ar", round(prev, 2)))
        i += 1
        rows.append(
            (i, f"{dd} 12:00:00", 1, "iid", round(rng.uniform(1, 99), 2))
        )
        i += 1
    sf = _events(spark, tmp_path, rows)
    got = {r.event_type: r for r in S.events_ljung_box(spark, sf).collect()}
    assert got["ar"].autocorrelated_5pct
    # python replay for the AR series
    daily = {}
    for _i, ts, _u, t, v in rows:
        if t != "ar":
            continue
        daily[ts[:10]] = daily.get(ts[:10], 0) + round(v * 100)
    days = sorted(daily)
    ys = [daily[k] for k in days]
    n, s = len(ys), sum(ys)
    dev = {d_: n * y - s for d_, y in zip(days, ys)}
    den = sum(v * v for v in dev.values())
    tq = 0
    for lag in range(1, 8):
        num = sum(
            dev[a] * dev[b]
            for a in days
            for b in [_day_plus(a, lag)]
            if b in dev
        )
        rk = num / den
        tq += math.floor(rk * rk / (n - lag) * (1 << 40) + 0.5)
    q = n * (n + 2) * tq / (1 << 40)
    assert got["ar"].q_stat == pytest.approx(q, rel=1e-12)


@pytest.mark.parametrize("seed", [29, 61, 79])
def test_split_drift_matches_python(spark, tmp_path, seed):
    import hashlib

    rng = random.Random(seed)
    rows = [
        Row(doc_id=i, text="w", lang=rng.choice(["en", "de"]),
            source="s", n_chars=rng.randint(10, 400))
        for i in range(120)
    ]
    _write(spark.createDataFrame(rows), tmp_path, "documents")
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    train, test = [], []
    for grp in by_lang.values():
        grp.sort(
            key=lambda r: (
                hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id
            )
        )
        n = len(grp)
        for i, r in enumerate(grp, start=1):
            if i * 10 <= n * 8:
                train.append(r.n_chars)
            elif i * 10 > n * 9:
                test.append(r.n_chars)
    n1, n2 = len(train), len(test)
    import bisect

    st, ss = sorted(train), sorted(test)
    d_num = max(
        abs(bisect.bisect_right(st, x) * n2 - bisect.bisect_right(ss, x) * n1)
        for x in set(train) | set(test)
    )
    row = C.corpus_split_drift(spark, str(tmp_path)).collect()[0]
    assert (row.n_train, row.n_test) == (n1, n2)
    assert row.d_stat == pytest.approx(d_num / (n1 * n2))


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_line_block_dedup_matches_python_bruteforce(spark, seed, tmp_path):
    """Random small-vocab corpora (collisions guaranteed): recount the
    first-occurrence block dedup in pure Python."""
    import re

    from spot_anomalies_flink_workshop_resources_spark.operators import (
        dedup as D,
    )

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = []
    for i in range(40):
        n = rng.randint(0, 30)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n)),
                     "en", f"s{i % 3}", n))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    bt = 4
    got = {
        r.source: (r.n_blocks, r.n_dups, r.dup_chars)
        for r in D.line_block_dedup(df, block_tokens=bt).collect()
    }
    # pure-Python recount
    tok_re = re.compile("[a-z0-9]+")
    seen = {}
    per_src = {}
    for doc_id, text, _lang, src, _n in docs:
        toks = tok_re.findall(text.lower())
        if not toks:
            continue
        for bi in range(0, (len(toks) + bt - 1) // bt):
            blk = " ".join(toks[bi * bt:(bi + 1) * bt])
            nb, nd, dc = per_src.get(src, (0, 0, 0))
            first = seen.setdefault(blk, (doc_id, bi))
            dup = first != (doc_id, bi)
            per_src[src] = (
                nb + 1, nd + (1 if dup else 0), dc + (len(blk) if dup else 0)
            )
    assert got == per_src


@pytest.mark.parametrize("seed", [21, 22])
def test_gopher_rules_match_python_bruteforce(spark, seed, tmp_path):
    """Random corpora incl. stopwords and repeated tokens: recount every
    rule's pass/fail in pure Python."""
    import re

    from spot_anomalies_flink_workshop_resources_spark.operators import (
        quality as Q,
    )

    rng = random.Random(seed)
    words = ["the", "a", "of", "data", "spark", "xx", "yyyy", "zzzzzz"]
    docs = []
    for i in range(30):
        n = rng.randint(0, 60)
        docs.append((i, " ".join(rng.choice(words) for _ in range(n)),
                     "en", f"s{i % 2}", n))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r.source, r.rule): (r.n_pass, r.n_fail)
        for r in Q.gopher_rules(df).collect()
    }
    tok_re = re.compile("[a-z0-9]+")
    stopset = set(Q.GOPHER_STOPWORDS)
    expect = {}
    for doc_id, text, _lang, src, _n in docs:
        toks = tok_re.findall(text.lower())
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        max_tf = max(tf.values()) if tf else 0
        n_stop = len(set(toks) & stopset)
        n_alpha = sum(c for t, c in tf.items() if re.search("[a-z]", t))
        rules = {
            "word_count": Q.GOPHER_MIN_WORDS <= n <= Q.GOPHER_MAX_WORDS,
            "mean_word_len": n > 0
            and Q.GOPHER_MIN_MEAN_WORD_LEN * n <= sum_len
            <= Q.GOPHER_MAX_MEAN_WORD_LEN * n,
            "stopwords": n_stop >= Q.GOPHER_MIN_STOPWORDS,
            "repetition": n > 0 and Q.GOPHER_MAX_TOP_TOKEN_X5 * max_tf <= n,
            "alpha_ratio": n > 0 and 5 * n_alpha >= 4 * n,
        }
        for rule, ok in rules.items():
            p, f = expect.get((src, rule), (0, 0))
            expect[(src, rule)] = (p + (1 if ok else 0), f + (0 if ok else 1))
    assert got == expect
