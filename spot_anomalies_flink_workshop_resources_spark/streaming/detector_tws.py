"""transformWithStateInPandas backend for the CEP detector (Spark 4 API).

Same semantics as ``detector.detect_attack_runs_stream`` (the
applyInPandasWithState backend) — identical batch processing via the
shared ``_process_batch_vectorized`` — but hosted in the newer
StatefulProcessor API (SPARK-49564), which brings per-state-variable
typing, timers, and initial-state hydration.

Environment note: executing this API requires a working
``google.protobuf`` runtime (the TWS state server speaks protobuf to the
Python worker); plan construction does not. Where protobuf is absent the
applyInPandasWithState backend in ``detector.py`` is the primary path —
both produce identical results by construction (shared batch processor).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .detector import (
    EMPTY_STATE,
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    _process_batch_vectorized,
)


class AttackRunProcessor(StatefulProcessor):
    """Per-key greedy run state machine (reference AD.java:126-167)."""

    def __init__(
        self,
        low_threshold: float,
        high_threshold: float,
        min_run: int,
        max_run: int,
        window_seconds: float,
    ) -> None:
        self._params = (
            low_threshold,
            high_threshold,
            min_run,
            max_run,
            window_seconds,
        )

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("run_state", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        low, high, min_run, max_run, window = self._params
        state_tuple = self._state.get() if self._state.exists() else EMPTY_STATE
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["_ts", "_oid"], kind="mergesort")
        out, state_tuple = _process_batch_vectorized(
            batch, tuple(state_tuple), str(key[0]), low, high, min_run, max_run,
            window,
        )
        if state_tuple[0] > 0:
            self._state.update(state_tuple)
        elif self._state.exists():
            self._state.clear()
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    def close(self) -> None:
        pass


def detect_attack_runs_tws(
    events: DataFrame,
    *,
    key_col: str,
    time_col: str,
    order_col: str,
    metric_col: str,
    low_threshold: float,
    high_threshold: float,
    min_run: int,
    max_run: int,
    window_seconds: float,
    size_expr=None,
    end_time_col: str | None = None,
    attacker_col: str | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """transformWithStateInPandas twin of ``detect_attack_runs_stream``."""
    from pyspark.sql import functions as F

    size = size_expr if size_expr is not None else F.col(metric_col)
    end_time = F.col(end_time_col) if end_time_col else F.col(time_col)
    attacker = F.col(attacker_col) if attacker_col else F.col(order_col)

    from ..functions.timeutil import watermarkable

    prepared = events.select(
        F.col(key_col).cast("string").alias("_key"),
        watermarkable(F.col(time_col)).alias("_ts"),
        F.col(order_col).alias("_oid"),
        F.col(metric_col).cast("double").alias("_metric"),
        size.cast("double").alias("_size"),
        watermarkable(end_time).alias("_end_ts"),
        attacker.cast("string").alias("_attacker"),
    ).withWatermark("_ts", watermark)

    processor = AttackRunProcessor(
        low_threshold, high_threshold, min_run, max_run, window_seconds
    )
    return prepared.groupBy("_key").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
