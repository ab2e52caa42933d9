"""Old-vs-new builder parity: run a query at git HEAD code vs the
working tree and require IDENTICAL collected results (schema + rows,
bit-exact through Arrow) at one or more scale factors.

Used by the round-11 construction conversions (Column-tree -> SQL-string
builders): the converted plan must produce byte-identical output before
the oracle sweep even runs.

Usage:
    python tools/parity_check.py <query> [sf_dir ...]

The OLD builder is imported from a git worktree/stash copy placed at
/tmp/parity_old (``git worktree add /tmp/parity_old HEAD``) by the
caller; this script imports plans.harness from BOTH roots and compares.
"""

from __future__ import annotations

import sys

OLD_ROOT = "/tmp/parity_old"


def main() -> None:
    names = []
    sf_dirs = []
    for a in sys.argv[1:]:
        (sf_dirs if a.startswith("/") else names).append(a)
    if not sf_dirs:
        sf_dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    if not names:
        print("usage: parity_check.py <query> [...] [sf_dir ...]")
        raise SystemExit(2)

    sys.path.insert(0, "/root/repo")
    from spot_anomalies_flink_workshop_resources_spark.plans import (
        harness as new_harness,
    )
    from spot_anomalies_flink_workshop_resources_spark.session import (
        build_session,
    )

    import importlib.util
    import os

    if not os.path.isdir(OLD_ROOT):
        print(f"missing {OLD_ROOT}: git worktree add {OLD_ROOT} HEAD")
        raise SystemExit(2)

    # import the OLD package under an alias so both can coexist
    old_pkg_name = "old_engine_pkg"
    spec = importlib.util.spec_from_file_location(
        old_pkg_name,
        f"{OLD_ROOT}/spot_anomalies_flink_workshop_resources_spark/__init__.py",
        submodule_search_locations=[
            f"{OLD_ROOT}/spot_anomalies_flink_workshop_resources_spark"
        ],
    )
    old_pkg = importlib.util.module_from_spec(spec)
    sys.modules[old_pkg_name] = old_pkg
    spec.loader.exec_module(old_pkg)
    import importlib

    old_harness = importlib.import_module(f"{old_pkg_name}.plans.harness")

    spark = build_session("parity-check")
    spark.sparkContext.setLogLevel("ERROR")
    newq = new_harness.build_queries()
    oldq = old_harness.build_queries()

    bad = 0
    for sf_dir in sf_dirs:
        for name in names:
            dn = newq[name](spark, sf_dir)
            do = oldq[name](spark, sf_dir)
            tn, to = dn.toArrow(), do.toArrow()
            # nullability is NOT part of the driver's cross-engine
            # schema check (DuckDB fields carry their own flags);
            # compare names + types only
            sn = [(f.name, f.type) for f in tn.schema]
            so = [(f.name, f.type) for f in to.schema]
            if sn != so:
                print(f"FAIL {name} @ {sf_dir}: schema\n  new={tn.schema}\n  old={to.schema}")
                bad += 1
                continue
            cn = sorted(
                zip(*[tn.column(c).to_pylist() for c in tn.column_names]),
                key=lambda r: tuple((x is None, str(x)) for x in r),
            ) if tn.num_rows else []
            co = sorted(
                zip(*[to.column(c).to_pylist() for c in to.column_names]),
                key=lambda r: tuple((x is None, str(x)) for x in r),
            ) if to.num_rows else []
            if cn != co:
                print(f"FAIL {name} @ {sf_dir}: rows differ ({tn.num_rows} vs {to.num_rows})")
                for i, (a, b) in enumerate(zip(cn, co)):
                    if a != b:
                        print(f"  first diff row {i}:\n    new={a}\n    old={b}")
                        break
                bad += 1
            else:
                print(f"OK   {name} @ {sf_dir}: {tn.num_rows} rows bit-exact")
    spark.stop()
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
