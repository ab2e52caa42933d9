"""Dump ``explain("formatted")`` for named registry queries to files.

Round-10 deliverable helper: the optimization judge checks plan claims
against committed ``plans/r10/<query>_{before,after}.txt`` files, so this
tool writes exactly that — no execution, plan compilation only.

Usage:
  python tools/dump_plans.py --out plans/r10 --suffix before \
      [--sf-dir /root/testdata/sf0.1] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spot_anomalies_flink_workshop_resources_spark.plans import harness
from spot_anomalies_flink_workshop_resources_spark.session import build_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = build_session("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    registry = harness.build_queries()
    os.makedirs(args.out, exist_ok=True)
    rc = 0
    for name in args.queries:
        if name not in registry:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            rc = 1
            continue
        df = registry[name](spark, args.sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
