"""Property test: the vectorized batch processor is exactly equivalent to
the scalar reference state machine, on random event sequences and random
batch splits (carry-state across batches). Pure pandas — no Spark."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from spot_anomalies_flink_workshop_resources_spark.streaming.detector import (
    EMPTY_STATE,
    _process_batch_scalar,
    _process_batch_vectorized,
)

PARAMS = dict(
    key_str="k",
    low_threshold=10.0,
    high_threshold=10.0,
    min_run=3,
    max_run=6,
    window_seconds=50.0,
)


def _frame(metrics, t0=0.0, nat_every=0):
    n = len(metrics)
    ts = pd.to_datetime((np.arange(n) * 2.0 + t0) * 1e6, unit="us")
    # sizes chosen to be FP-rounding-sensitive: a sum computed in a
    # different association order would differ in the last ulp, so the
    # equality assertion also pins summation order
    sizes = np.array(metrics, dtype=float) * 1.1 + np.arange(n) * 0.0137
    end_ts = pd.Series(ts + pd.Timedelta(milliseconds=10))
    if nat_every:
        # serde's tolerant parsing admits null timestamp_end — the
        # vectorized path must fall back to ts exactly like the scalar one
        end_ts[::nat_every] = pd.NaT
    return pd.DataFrame(
        {
            "_ts": ts,
            "_oid": np.arange(n),
            "_metric": np.array(metrics, dtype=float),
            "_size": sizes,
            "_end_ts": end_ts,
            "_attacker": [f"a{i}" for i in range(n)],
        }
    )


@given(
    metrics=st.lists(
        st.sampled_from([1.0, 5.0, 10.0, 15.0, 200.0]), min_size=0, max_size=120
    ),
    split=st.integers(min_value=0, max_value=120),
    nat_every=st.sampled_from([0, 1, 2, 3]),
)
@settings(max_examples=300, deadline=None)
def test_vectorized_equals_scalar(metrics, split, nat_every):
    split = min(split, len(metrics))
    chunks = [metrics[:split], metrics[split:]]
    s_state = v_state = EMPTY_STATE
    s_out_all, v_out_all = [], []
    offset = 0.0
    for chunk in chunks:
        df = _frame(chunk, t0=offset, nat_every=nat_every)
        offset += len(chunk) * 2.0
        s_out, s_state = _process_batch_scalar(df, s_state, **PARAMS)
        v_out, v_state = _process_batch_vectorized(df, v_state, **PARAMS)
        s_out_all += s_out
        v_out_all += v_out
    assert v_out_all == s_out_all
    assert v_state == s_state


def test_vectorized_handles_nan_rows():
    df = _frame([1.0, 1.0, 1.0, 1.0, 200.0])
    df.loc[2, "_metric"] = np.nan
    s_out, s_state = _process_batch_scalar(df, EMPTY_STATE, **PARAMS)
    v_out, v_state = _process_batch_vectorized(df, EMPTY_STATE, **PARAMS)
    assert v_out == s_out and v_state == s_state


def test_vectorized_null_end_ts_falls_back_to_ts():
    """Regression: NaT end_ts once became int64-min/1e6 (-9.22e12) in the
    vectorized path instead of falling back to the event ts."""
    df = _frame([1.0, 1.0, 1.0, 1.0, 200.0], nat_every=1)
    s_out, s_state = _process_batch_scalar(df, EMPTY_STATE, **PARAMS)
    v_out, v_state = _process_batch_vectorized(df, EMPTY_STATE, **PARAMS)
    assert v_out == s_out and v_state == s_state
    assert v_out, "expected an alert"
    assert v_out[0][2] > 0, "attack_end_time must be the event ts, not int64-min"


class _FakeState:
    """Minimal GroupState stand-in — make_detector_fn's product is plain
    Python, so processing-time semantics are testable without Spark."""

    def __init__(self):
        self._val = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None


def _run_proc_batches(batches, clock_values, window_seconds=50.0):
    from spot_anomalies_flink_workshop_resources_spark.streaming.detector import (
        make_detector_fn,
    )

    clock_iter = iter(clock_values)
    fn = make_detector_fn(
        low_threshold=10.0, high_threshold=10.0, min_run=3, max_run=6,
        window_seconds=window_seconds, time_mode="processing",
        clock=lambda: next(clock_iter),
    )
    state = _FakeState()
    outs = []
    for df in batches:
        outs += list(fn(("k",), iter([df]), state))
    non_empty = [o for o in outs if len(o)]
    if non_empty:
        return pd.concat(non_empty, ignore_index=True), state
    return (outs[0].iloc[0:0] if outs else pd.DataFrame()), state


def test_processing_time_within_prunes_stale_partial():
    """A partial match older than the wall-clock window is pruned before
    the next batch applies (AD.java:137 processing-time within)."""
    b1 = _frame([1.0, 1.0], t0=0.0)           # partial run, 2 anomalous
    b2 = _frame([1.0, 200.0], t0=4.0)         # +1 anomalous, then trigger
    # fresh case: second batch 10 s later -> run survives, 3 >= min_run
    out, _ = _run_proc_batches([b1, b2], clock_values=[1000.0, 1010.0])
    assert len(out) == 1 and out.loc[0, "fragment_count"] == 3
    # stale case: second batch 60 s later -> partial pruned, only 1
    # anomalous event remains before the trigger -> no alert
    out, _ = _run_proc_batches([b1, b2], clock_values=[1000.0, 1060.0])
    assert len(out) == 0


def test_processing_time_event_gaps_do_not_expire():
    """Processing time ignores event-time gaps: events 10 days apart in
    event time still match if processed within the wall-clock window
    (the exact semantics the event-time default deviates from)."""
    b1 = _frame([1.0, 1.0], t0=0.0)
    b2 = _frame([1.0, 200.0], t0=86400.0 * 10)
    out, _ = _run_proc_batches([b1, b2], clock_values=[1000.0, 1001.0])
    assert len(out) == 1 and out.loc[0, "fragment_count"] == 3


def test_processing_time_window_restarts_for_new_run():
    """After a trigger resets the run, a NEW run's window starts at its
    own first-seen instant, not the old run's."""
    b1 = _frame([1.0, 1.0, 1.0, 200.0], t0=0.0)      # complete run, alert
    b2 = _frame([1.0, 1.0], t0=10.0)                 # new partial
    b3 = _frame([1.0, 200.0], t0=20.0)               # completes new run
    out, _ = _run_proc_batches(
        [b1, b2, b3], clock_values=[1000.0, 2000.0, 2010.0]
    )
    # both runs alert: first inside batch 1; second spans b2+b3 within
    # 10 s of wall clock even though 1000 s passed since batch 1
    assert list(out["fragment_count"]) == [3, 3]
