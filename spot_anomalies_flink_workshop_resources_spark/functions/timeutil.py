"""Timestamp-type-agnostic helpers (TIMESTAMP vs TIMESTAMP_NTZ).

The harness parquet has shipped the event-time columns both as
``timestamp[us, tz=UTC]`` (Spark TIMESTAMP) and as ``timestamp[us]``
with no zone (Spark TIMESTAMP_NTZ).  The engine must accept either:
TIMESTAMP_NTZ cannot be cast to DOUBLE (no epoch arithmetic) and cannot
carry a streaming watermark (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so
every epoch computation and every stream source funnels through here.

The engine pins the session time zone to UTC (session.py), which makes
the NTZ->TIMESTAMP cast value-preserving, and DuckDB's ``epoch()`` over
the same naive values (treated as UTC) agrees bit-for-bit — so oracle
hashes are unchanged whichever flavor the input parquet carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ts_seconds(col: Column) -> Column:
    """Fractional epoch seconds (double) from TIMESTAMP or TIMESTAMP_NTZ.

    The intermediate TIMESTAMP cast is an identity for tz-aware input and
    a session-tz (UTC) reinterpretation for NTZ input; microsecond epochs
    fit a double exactly (~1.7e15 < 2^53), so no precision is lost.
    """
    return col.cast("timestamp").cast("double")


def col_seconds(df: DataFrame, name: str) -> Column:
    """Epoch seconds for a named column that may already be numeric
    (operators that compose — e.g. the skew-split detector feeding the
    one-shot detector pre-converted doubles — pass numerics through
    untouched)."""
    if dict(df.dtypes)[name].startswith("timestamp"):
        return ts_seconds(F.col(name))
    return F.col(name).cast("double")


def watermarkable(col: Column) -> Column:
    """A column usable as a streaming event-time: TIMESTAMP_NTZ is cast
    to TIMESTAMP (watermarks require it); TIMESTAMP passes through."""
    return col.cast("timestamp")


def cast_timestamps_ntz(df: DataFrame, when: bool = True) -> DataFrame:
    """Cast every plain-TIMESTAMP column of ``df`` to TIMESTAMP_NTZ.

    Streaming plans force tz-aware event time internally; when the
    SOURCE table carried NTZ, emitted timestamps are cast back so the
    query's output schema matches what a batch reader (and the DuckDB
    oracle) sees — value-preserving under the engine's UTC session tz.
    """
    if not when:
        return df
    ntz_casts = [
        F.col(name).cast("timestamp_ntz").alias(name)
        if dtype == "timestamp"
        else F.col(name)
        for name, dtype in df.dtypes
    ]
    return df.select(*ntz_casts)
