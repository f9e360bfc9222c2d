#!/usr/bin/env python
"""Automated physical-plan audit across the whole registered surface.

For every `queries()` entry, builds the DataFrame at a small SF and
inspects the physical plan string for plan-quality violations:

1. CartesianProduct — an unkeyed O(n*m) join that AQE cannot save.
   Broadcast nested-loop joins over tiny/1-row relations (the scalar
   crossJoin pattern) are fine and NOT flagged.
2. Duplicated Python-UDF evaluation — the same ArrowEvalPython /
   BatchEvalPython expression appearing in two stacked nodes means
   Catalyst's projection collapse made the UDF run more than once per
   row (caught live on v_ivfpq_knn in round 3; see PLANS.md).
3. Row-at-a-time BatchEvalPython — every Python crossing in this repo
   is supposed to be Arrow-batched.

Usage:
    python tools/plan_audit.py [sf_dir] [name ...]

Exit 1 on any violation; prints one line per query otherwise.
Construction-time actions (codebook collects, Newton steps) run at the
given SF, so the audit doubles as a construction smoke test.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def audit_plan(plan: str) -> list[str]:
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct node")
    if "BatchEvalPython" in plan:
        problems.append("row-at-a-time BatchEvalPython (not Arrow)")
    # same UDF evaluated in more than one ArrowEvalPython node
    udfs = re.findall(r"ArrowEvalPython \[([a-zA-Z0-9_]+)\(", plan)
    dups = {u for u in udfs if udfs.count(u) > 1}
    if dups:
        problems.append(f"duplicated ArrowEvalPython: {sorted(dups)}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from daxos_spark.plans import get_specs
    from daxos_spark.session import get_spark

    spark = get_spark()
    qs = E.queries()
    specs = get_specs()
    bad = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        # eager (checkpoint-pattern) queries expose their real pipeline
        # via lazy_plan — auditing the registered callable would only
        # see the post-checkpoint RDD scan
        spec = specs.get(name)
        fn = spec.lazy_plan if spec is not None and spec.lazy_plan else qs[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # construction failure is itself a finding
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:140]}")
            bad += 1
            continue
        finally:
            spark.catalog.clearCache()  # lazy builders may mark persists
        problems = audit_plan(plan)
        if problems:
            print(f"FLAG {name}: {'; '.join(problems)}")
            bad += 1
        else:
            print(f"ok   {name}")
    print(f"== {bad} flagged of {len(only) if only else len(qs)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
