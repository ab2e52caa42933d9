"""Bit-portable scalar transcendentals (ln / exp) for oracle-exact
final stages.

Why this exists (VERDICT r6 #5, the last 6 float ulps): Spark evaluates
``F.log`` / ``F.exp`` with ``java.lang.Math``, DuckDB with the C
runtime's libm. Both are faithfully rounded but NOT identically rounded
— measured on 6k uniform samples they disagree by 1 ulp on ~1.4% (ln)
and ~4.6% (exp) of arguments, while CPython's ``math.log`` /
``math.exp`` (thin wrappers over the same platform libm DuckDB links)
agreed with DuckDB on every sample. ``sqrt`` needs no such treatment:
it is IEEE-754 correctly rounded everywhere (0/6000 mismatches).

So: when a query's FINAL stage applies ln/exp to already-exact
operands, route that one call through an Arrow-batched pandas UDF that
applies the scalar libm function per element. NumPy's vectorized
``np.log``/``np.exp`` would NOT do (SIMD polynomial paths — 1627/6000
bit-mismatches vs libm); the loop below is deliberate.

Cost model: one scalar C call per row inside an Arrow batch — used on
vocab-/domain-bounded frames (idf tables, per-day hazard grids, LM
model rows) this is noise; on data-sized frames (the weighted-sample
coin) it costs ~0.3 µs/row, an acceptable price for cross-engine
bit-equality of a per-row key. At 100 TB, swap back to ``F.log`` and
accept 1-ulp drift, or pin executors to a known libm.

Null semantics mirror Spark's: NULL / non-positive -> NULL for log;
NULL -> NULL for exp (overflow saturates to +inf like the builtins).
NULL handling CANNOT live inside the pandas UDF: Arrow hands SQL NULLs
to a float64 Series as NaN, so ``v is None`` never fires there (ADVICE
r7). The public wrappers therefore mask NULL JVM-side with
``F.when(col.isNull(), NULL)`` before the UDF result is consulted —
that is the only place the NULL/NaN distinction still exists.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def _libm_log(x: pd.Series) -> pd.Series:
    out = []
    for v in x:
        if v is None:
            out.append(None)
        elif v != v:  # NaN propagates
            out.append(float("nan"))
        elif v <= 0.0:  # Spark F.log: NULL on non-positive
            out.append(None)
        else:
            out.append(math.log(v))
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def _libm_exp(x: pd.Series) -> pd.Series:
    out = []
    for v in x:
        if v is None or v != v:
            out.append(None if v is None else float("nan"))
        else:
            try:
                out.append(math.exp(v))
            except OverflowError:
                out.append(float("inf"))
    return pd.Series(out, dtype="float64")


def libm_log(col: Column) -> Column:
    """ln(col) evaluated by the platform libm (bit-matches DuckDB).

    NULL -> NULL and NaN -> NaN like ``F.log``. Both are masked
    JVM-side: inside the UDF a SQL NULL is indistinguishable from NaN
    in the Arrow float64 batch, and on the way OUT Arrow's from_pandas
    null inference turns an emitted NaN into SQL NULL — so neither
    direction can be handled in Python.
    """
    return (
        F.when(col.isNull(), F.lit(None).cast("double"))
        .when(F.isnan(col), F.lit(float("nan")))
        .otherwise(_libm_log(col))
    )


def libm_exp(col: Column) -> Column:
    """exp(col) evaluated by the platform libm (bit-matches DuckDB).

    NULL -> NULL and NaN -> NaN like ``F.exp`` (masked JVM-side, see
    :func:`libm_log`).
    """
    return (
        F.when(col.isNull(), F.lit(None).cast("double"))
        .when(F.isnan(col), F.lit(float("nan")))
        .otherwise(_libm_exp(col))
    )
