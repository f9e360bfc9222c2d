#!/usr/bin/env python
"""Dump .explain("formatted") for named registered queries.

Usage: python tools/dump_plan.py OUT_DIR SUFFIX [sf_dir] name [name ...]

Writes OUT_DIR/<name>_<SUFFIX>.txt per query. Uses the spec's
``lazy_plan`` when present (the real pipeline plan, not the
post-checkpoint RDD scan of eagerly-materializing callables).
Construction-time actions (collect-driven iterative builds) run at the
given SF, so prefer a small sf_dir.
"""

from __future__ import annotations

import pathlib
import sys


def main() -> None:
    out_dir = pathlib.Path(sys.argv[1])
    suffix = sys.argv[2]
    args = sys.argv[3:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.001", args
    out_dir.mkdir(parents=True, exist_ok=True)

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from daxos_spark.plans.registry import get_specs
    from daxos_spark.session import get_spark

    spark = get_spark()
    specs = get_specs()
    for name in names:
        spec = specs[name]
        builder = spec.lazy_plan or spec.spark
        df = builder(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        p = out_dir / f"{name}_{suffix}.txt"
        p.write_text(plan)
        print(f"wrote {p} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
