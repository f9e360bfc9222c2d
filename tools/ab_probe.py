"""Isolated A/B timing probe for bench-drift attribution.

Measures ONE query from ONE code tree in a fresh process, with exactly
bench.py's semantics (noop-write materialization; per rep a min-of-2
pair where run 1 repopulates any in-query caches and run 2 reuses them;
`spark.catalog.clearCache()` between reps so reps are independent).
Attribution method per SCALE.md "Bench drift attribution": run this
interleaved for the old-code worktree and the current tree, compare the
rep minima — if old ≈ new the suite delta is environmental
(cache-subsidy removal / suite load), otherwise it's a code regression.

Usage:
    python tools/ab_probe.py <repo_root> <query> [sf_dir] [reps]

Prints one JSON line: {"repo": ..., "query": ..., "cold": s,
"reps": [s, s, s]}.
"""

import json
import sys
import time


def main() -> None:
    repo, query = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    sys.path.insert(0, repo)
    from daxos_spark.catalog import load_tables
    from daxos_spark.plans import get_specs
    from daxos_spark.session import get_spark

    spark = get_spark("ab_probe")
    load_tables(spark, sf_dir)["region"].count()
    spec = get_specs()[query]

    def run() -> float:
        t0 = time.time()
        spec.spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    cold = run()  # parquet footers + codegen, discarded
    spark.catalog.clearCache()
    out = []
    for _ in range(reps):
        out.append(round(min(run(), run()), 3))
        spark.catalog.clearCache()
    print(json.dumps({"repo": repo, "query": query, "cold": round(cold, 3), "reps": out}))


if __name__ == "__main__":
    main()
