"""Scale spot-run: time named registry queries at one or more sf dirs.

Formalizes the SCALE.md spot-run protocol (VERDICT r6 #6 onward, ad-hoc
until round 9): for each query name, run 2 passes per sf dir via the
noop sink (no driver collect cost), keep the per-query MINIMUM (host
noise is one-sided), clear non-protected cached state between queries
(bench.py's order-independence rule), and print one JSON object
  {query: {sf_label: wall_sec, ...}, ...}
plus a ready-to-paste markdown table with the ratio of the LAST sf
column over the FIRST.

Usage:
  python tools/spot_run.py --sf LABEL=DIR [--sf LABEL=DIR ...] \
      [--passes 2] query [query ...]

Example (round-9 newcomers at sf0.1 vs sf1):
  python tools/spot_run.py --sf sf0.1=/root/testdata/sf0.1 \
      --sf sf1=/root/repo/.scale/sf1 dq_temporal_drift sql_hhi_trend
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spot_anomalies_flink_workshop_resources_spark.plans import harness
from spot_anomalies_flink_workshop_resources_spark.session import build_session


def _clear_cached_state(spark) -> None:
    from spot_anomalies_flink_workshop_resources_spark.operators import (
        dedup as _dedup,
    )
    from spot_anomalies_flink_workshop_resources_spark.plans import (
        curation as _curation,
    )

    keep = _curation.protected_rdd_ids() | _dedup.protected_rdd_ids()
    prdds = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in prdds.keySet().toArray():
        if int(rid) not in keep:
            prdds.get(rid).unpersist()
    spark.catalog.clearCache()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument(
        "--sf",
        action="append",
        required=True,
        metavar="LABEL=DIR",
        help="scale point: label=parquet_dir (repeatable, ordered)",
    )
    p.add_argument("--passes", type=int, default=2)
    p.add_argument(
        "--warm-dir",
        default=None,
        help="warmup corpus (default: the first --sf dir; ADVICE r9 — a "
        "hard-coded /root/testdata/sf0.001 was silently skipped on hosts "
        "without it, letting the first timed query absorb one-time "
        "codegen/Arrow costs)",
    )
    p.add_argument("queries", nargs="+")
    a = p.parse_args()

    sfs: list[tuple[str, str]] = []
    for spec in a.sf:
        label, _, d = spec.partition("=")
        if not d or not os.path.isdir(d):
            p.error(f"--sf {spec!r}: directory missing")
        sfs.append((label, d))

    spark = build_session("spot-run")
    spark.sparkContext.setLogLevel("ERROR")
    queries = harness.build_queries()
    unknown = [q for q in a.queries if q not in queries]
    if unknown:
        p.error(f"unknown queries: {unknown}")

    # warmup (bench.py's rule): prime JVM codegen, the Python worker
    # pool + Arrow serde, and streaming state-store machinery so the
    # first timed query doesn't absorb one-time costs. Prefer the tiny
    # driver corpus when present, else fall back to the first --sf dir
    # (never skip silently — ADVICE r9).
    warm = a.warm_dir or (
        "/root/testdata/sf0.001"
        if os.path.isdir("/root/testdata/sf0.001")
        else sfs[0][1]
    )
    if os.path.isdir(warm):
        for w in ("q1_pricing_summary", "dedup_simhash_packed",
                  "cep_fragmentation_stream"):
            if w in queries:
                queries[w](spark, warm).write.format("noop").mode(
                    "overwrite"
                ).save()
                _clear_cached_state(spark)
    else:
        print(
            f"spot_run: WARNING warmup dir {warm!r} missing — first timed "
            "query will absorb one-time codegen/Arrow costs",
            file=sys.stderr,
        )

    results: dict[str, dict[str, float]] = {q: {} for q in a.queries}
    for label, d in sfs:
        for q in a.queries:
            best = float("inf")
            for _ in range(a.passes):
                t0 = time.perf_counter()
                queries[q](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
                _clear_cached_state(spark)
            results[q][label] = round(best, 2)
            print(f"  {q} @ {label}: {results[q][label]}s", file=sys.stderr)

    print(json.dumps(results, indent=1))
    first, last = sfs[0][0], sfs[-1][0]
    print(f"\n| query | {first} s | {last} s | ratio |")
    print("|---|---|---|---|")
    for q in a.queries:
        r0, r1 = results[q][first], results[q][last]
        ratio = r1 / r0 if r0 > 0 else float("nan")
        print(f"| {q} | {r0:.2f} | {r1:.2f} | {ratio:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
