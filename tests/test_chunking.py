"""Token-window chunking: hand-computed fixtures, boundary chunk
counts, full coverage/overlap invariants. Cross-engine equality is
covered by the corpus_chunk_windows oracle."""

from __future__ import annotations

import pytest

from spot_anomalies_flink_workshop_resources_spark.operators.chunking import (
    chunk_windows,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)], DOCS_SCHEMA
    )


def _tokens(n):
    return " ".join(f"w{i}" for i in range(n))


def test_chunk_windows_hand_computed(spark):
    # 10 tokens, window 4, stride 3 -> starts 0,3,6; the chunk at 6
    # reaches token 9, so every token is covered in 3 chunks
    rows = sorted(
        (r.chunk_id, r.chunk_start, r.chunk_tokens, r.chunk_text)
        for r in chunk_windows(
            _docs(spark, [_tokens(10)]), window=4, stride=3
        ).collect()
    )
    assert rows == [
        (0, 0, 4, "w0 w1 w2 w3"),
        (1, 3, 4, "w3 w4 w5 w6"),
        (2, 6, 4, "w6 w7 w8 w9"),
    ]


@pytest.mark.parametrize(
    "n,window,stride,expect",
    [
        (1, 4, 3, 1),   # shorter than one window
        (4, 4, 3, 1),   # exactly one window
        (5, 4, 3, 2),   # one token over
        (7, 4, 3, 2),   # last start at 3 covers through 6
        (8, 4, 3, 3),
        (6, 3, 3, 2),   # no overlap (stride == window)
        (7, 3, 3, 3),
    ],
)
def test_chunk_count_boundaries(spark, n, window, stride, expect):
    got = chunk_windows(
        _docs(spark, [_tokens(n)]), window=window, stride=stride
    ).count()
    assert got == expect, (n, window, stride)


def test_chunk_windows_covers_every_token_with_overlap(spark):
    """Every token index appears in at least one chunk; consecutive
    chunks share exactly window-stride tokens (except a short tail)."""
    rows = sorted(
        (r.chunk_id, r.chunk_start, r.chunk_tokens)
        for r in chunk_windows(
            _docs(spark, [_tokens(50)]), window=8, stride=5
        ).collect()
    )
    covered = set()
    for _, start, ntok in rows:
        covered |= set(range(start, start + ntok))
    assert covered == set(range(50))
    for (i1, s1, n1), (i2, s2, n2) in zip(rows, rows[1:]):
        assert i2 == i1 + 1 and s2 - s1 == 5
        overlap = max(0, (s1 + n1) - s2)
        assert overlap == 3 or s2 + n2 == 50  # window-stride, or tail


def test_chunk_windows_empty_and_blank_docs_yield_no_rows(spark):
    assert chunk_windows(_docs(spark, ["", "   ", "?!"])).count() == 0


def _ref_chunks(n_tokens, window, stride):
    """Pure-Python chunk plan: (chunk_id, start, length) triples."""
    if n_tokens == 0:
        return []
    n_chunks = (max(n_tokens - window, 0) + stride - 1) // stride + 1
    return [
        (i, i * stride, min(window, n_tokens - i * stride))
        for i in range(n_chunks)
    ]


def test_chunk_plan_property(spark):
    """Hypothesis sweep of the chunk-count/coverage arithmetic: for any
    (n_tokens, window, stride) the Spark plan must equal the reference
    triples, cover every token, and never emit an empty chunk."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=400),
        window=st.integers(min_value=1, max_value=50),
        data=st.data(),
    )
    def check(n, window, data):
        # the operator enforces stride <= window (overlap >= 0); the
        # hypothesis run that allowed stride > window found real gaps
        # and empty chunks, which is why the precondition exists
        stride = data.draw(st.integers(min_value=1, max_value=window))
        ref = _ref_chunks(n, window, stride)
        covered = set()
        for _, start, length in ref:
            assert length > 0
            covered |= set(range(start, start + length))
        assert covered == set(range(n))

    check()


def test_chunk_windows_rejects_gappy_stride(spark):
    import pytest

    with pytest.raises(ValueError, match="stride must be <= window"):
        chunk_windows(_docs(spark, ["a b c"]), window=2, stride=3)


def test_chunk_windows_matches_reference_plan(spark):
    """Spark output equals the pure-Python reference triples on a
    boundary grid (the Spark side of the property above — one job per
    grid, so the heavy sweep stays Python-side)."""
    for n, window, stride in [
        (0, 4, 3), (1, 1, 1), (5, 5, 5), (6, 5, 5), (7, 5, 3),
        (50, 8, 5), (23, 24, 16), (25, 24, 16),
    ]:
        got = sorted(
            (r.chunk_id, r.chunk_start, r.chunk_tokens)
            for r in chunk_windows(
                _docs(spark, [_tokens(n)]), window=window, stride=stride
            ).collect()
        )
        assert got == _ref_chunks(n, window, stride), (n, window, stride)
