"""Profile per-query PLAN CONSTRUCTION time (the Python fn(spark, sf_dir)
call, before any action) — the round-10 verdict's remaining "plan floor":
~0.15-0.6 s of py4j expression building per mid-band query, ~80 s/pass.

Two passes: pass 1 pays the catalog plan-memo misses; pass 2 is the
steady per-query construction floor the bench's 2-pass minima see.
Prints a JSON summary to stdout and per-query detail to
tools/PLAN_BUILD_PROFILE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spot_anomalies_flink_workshop_resources_spark.plans import harness
from spot_anomalies_flink_workshop_resources_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("plan-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = harness.build_queries()

    def one_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name, fn in sorted(queries.items()):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir)
            except Exception as e:  # construction must never fail
                out[name] = float("nan")
                print(f"BUILD FAIL {name}: {e}", file=sys.stderr)
                continue
            out[name] = round(time.perf_counter() - t0, 4)
        return out

    p1 = one_pass()
    p2 = one_pass()
    detail = {
        name: {"cold": p1[name], "warm": p2[name]} for name in sorted(p1)
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PLAN_BUILD_PROFILE.json")
    with open(path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    top = sorted(p2.items(), key=lambda kv: -kv[1])[:30]
    print(json.dumps({
        "n": len(p1),
        "total_cold": round(sum(p1.values()), 2),
        "total_warm": round(sum(p2.values()), 2),
        "top30_warm": [[n, t] for n, t in top],
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
