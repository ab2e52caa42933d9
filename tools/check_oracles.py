"""Self-check: run every queries() entry and its DuckDB oracle, compare.

Mimics the driver's correctness gate: row count, column names, and
order-insensitive value comparison. Exact equality is required for
non-float cells; floats must match to ~1e-9 relative (the harness
hash-compares, so the engine aims for bit-equality via exact decimal
aggregation — this script reports max float deltas so drift is visible).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from spot_anomalies_flink_workshop_resources_spark.catalog import TABLES
from spot_anomalies_flink_workshop_resources_spark.session import build_session


def normalize(rows, cols):
    out = []
    for row in rows:
        d = dict(zip(cols, row))
        out.append(tuple(d[c] for c in sorted(cols)))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(name, spark_df, con, sql):
    sdf = spark_df.toPandas()
    odf = con.sql(sql).df()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return f"FAIL {name}: columns spark={scols} oracle={ocols}"
    if len(sdf) != len(odf):
        return f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}"
    srows = normalize(sdf.itertuples(index=False, name=None), list(sdf.columns))
    orows = normalize(odf.itertuples(index=False, name=None), list(odf.columns))
    max_delta = 0.0
    for i, (sr, orr) in enumerate(zip(srows, orows)):
        for sv, ov in zip(sr, orr):
            if sv is None and ov is None:
                continue
            if isinstance(sv, float) or isinstance(ov, float):
                if sv is None or ov is None:
                    return f"FAIL {name}: row {i} null mismatch {sv!r} vs {ov!r}"
                try:
                    fv, fo = float(sv), float(ov)
                except (TypeError, ValueError):
                    return f"FAIL {name}: row {i} type mismatch {sv!r} vs {ov!r}"
                if math.isnan(fv) and math.isnan(fo):
                    continue
                delta = abs(fv - fo)
                rel = delta / max(abs(fv), abs(fo), 1e-30)
                max_delta = max(max_delta, rel)
                if fv != fo and rel > 1e-9:
                    return f"FAIL {name}: row {i} value {sv!r} vs {ov!r}"
            else:
                if str(sv) != str(ov):
                    return f"FAIL {name}: row {i} value {sv!r} vs {ov!r}"
    exact = " exact" if max_delta == 0.0 else f" max_rel_delta={max_delta:.2e}"
    return f"OK   {name}: {len(sdf)} rows{exact}"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark = build_session("check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"SKIP {name}: no oracle (rows={n})")
            continue
        try:
            msg = compare(name, fn(spark, sf_dir), con, oracles[name])
        except Exception as e:  # noqa: BLE001
            msg = f"FAIL {name}: exception {type(e).__name__}: {e}"
        print(msg)
        if msg.startswith("FAIL"):
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
