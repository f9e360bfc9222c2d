#!/usr/bin/env python
"""Adversarial DUP-HEAVY corpus probe for the SimHash band-join
hot-bucket cap (round-10 judge ask #2).

The standard 10× probe corpus (tools/sf1_probe.py) token-bijects its
replicas, so duplicate mass scales LINEARLY and no band bucket ever
gets hot — it cannot exercise the quadratic failure the cap exists to
bound, and its gopher-gate survivor mass is unrepresentative (bijected
tokens zero the stopword features). This probe synthesizes the opposite
corpus on purpose:

  sf0.1 documents (5,000 docs)  +  a planted family of N_FAM=3,000
  IDENTICAL English-shaped docs (same 56-bit fingerprint → ONE
  (band, value) bucket of 3,000 in each of the 4 bands).

Measured here:
  1. HASH PROOF with the cap: d_simhash_neardup(bucket_cap=CAP) on
     Spark vs the QUALIFY-capped duckdb oracle — identical value hash
     (the family's buckets are dropped by BOTH engines; the base
     corpus's legitimate pairs survive untouched and must equal the
     committed sf0.1 result).
  2. BOUNDEDNESS: the uncapped run materializes C(3000,2)·(bands hit)
     candidate rows from the planted family alone (~4.5M verified
     pairs); wall time + pair count of capped vs uncapped.
  3. SURVIVOR-MASS REALISM: the planted family is real English-shaped
     text (stopwords intact), so the gopher gate passes it — the 10×
     survivor-mass caveat from GATE_SF1_HEAVY_r9 does not apply to
     this corpus. t_gopher_rules survivor counts are printed.

A production funnel removes EXACT duplicates upstream of the SimHash
stage (d_exact_dedup / d_incremental_dedup); the cap guards the stage
against the corpora where that contract is violated or the family is
near-identical rather than exact — either way one 14-bit collision
class may not cost m² candidate work.

Usage: python tools/adversarial_dup_probe.py [out_dir]
       (default /root/repo/tmp_dup; synthesis skipped if present)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
N_FAM = 3_000
PROBE_CAP = 500  # < N_FAM so the planted family trips it; >> any
#                  legitimate sf0.1 bucket (measured max 382)

_FAM_TEXT = (
    "the quarterly report shows that revenue for the region grew by a "
    "steady margin and the board is confident in the outlook for the "
    "next fiscal year with strong demand across all of the key markets"
)


def synthesize(spark, out_dir: str) -> None:
    from daxos_spark.catalog import TABLES, load_tables

    os.makedirs(out_dir, exist_ok=True)
    tables = load_tables(spark, BASE)
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        if name != "documents":
            if not os.path.exists(dst):
                os.symlink(f"{BASE}/{name}.parquet", dst)
            continue
        d = tables["documents"]
        max_id = int(d.agg(F.max("doc_id")).first()[0])
        fam = spark.range(N_FAM).select(
            (F.col("id") + F.lit(max_id + 1)).alias("doc_id"),
            F.lit("web").alias("source"),
            F.lit(_FAM_TEXT).alias("text"),
            F.lit(len(_FAM_TEXT)).cast(
                dict(d.dtypes)["n_chars"]
            ).alias("n_chars"),
        )
        base = d.select("doc_id", "source", "text", "n_chars")
        base.unionByName(fam).repartition(32).write.mode("overwrite").parquet(dst)
        print(f"synthesized documents + planted family of {N_FAM}")


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp_dup"
    from daxos_spark.session import get_spark

    spark = get_spark()
    synthesize(spark, out_dir)

    import duckdb

    from tools.check_oracle import frame_digest

    from daxos_spark.plans.docpipe2 import _simhash_neardup_oracle, d_simhash_neardup

    # 1. hash proof with the cap, cross-engine on the adversarial corpus
    t0 = time.time()
    sdf = d_simhash_neardup(spark, out_dir, bucket_cap=PROBE_CAP).toPandas()
    t_cap = time.time() - t0
    spark.catalog.clearCache()
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    p = f"{out_dir}/documents.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pat}')")
    odf = con.execute(_simhash_neardup_oracle(bucket_cap=PROBE_CAP)).fetchdf()
    sn, sc, sh = frame_digest(sdf)
    on, oc, oh = frame_digest(odf)
    ok = (sn, sc, sh) == (on, oc, oh)
    print(
        f"{'PASS' if ok else 'FAIL'} d_simhash_neardup capped@{PROBE_CAP}: "
        f"spark n={sn} h={sh} ({t_cap:.1f}s) vs duckdb n={on} h={oh}"
    )

    # sanity: capped result on the adversarial corpus == the committed
    # sf0.1 result (the cap removes EXACTLY the planted family; the
    # base corpus's 888 pairs are untouched)
    bdf = d_simhash_neardup(spark, BASE).toPandas()
    spark.catalog.clearCache()
    bn, _, bh = frame_digest(bdf)
    same = (bn, bh) == (sn, sh)
    print(f"{'PASS' if same else 'FAIL'} capped == base sf0.1 result (n={bn} h={bh})")

    # 2. boundedness: the uncapped run pays the family's quadratic mass
    t0 = time.time()
    n_uncapped = d_simhash_neardup(spark, out_dir, bucket_cap=None).count()
    t_uncap = time.time() - t0
    spark.catalog.clearCache()
    fam_pairs = N_FAM * (N_FAM - 1) // 2
    print(
        f"uncapped: {n_uncapped} pairs in {t_uncap:.1f}s "
        f"(planted family alone = {fam_pairs}); capped: {sn} pairs in {t_cap:.1f}s"
    )

    # 3. survivor-mass realism: gopher gate is LIVE on this corpus
    import __spark_entry__ as E

    g = {
        r["source"]: (r["n_docs"], r["pass_all"])
        for r in E.queries()["t_gopher_rules"](spark, out_dir).collect()
    }
    spark.catalog.clearCache()
    print(f"gopher gate on adversarial corpus (per source n_docs, pass_all): {g}")
    ok_lsh = lsh_lane(spark, out_dir)
    return 0 if ok and same and ok_lsh else 1


def lsh_lane(spark, out_dir: str) -> bool:
    """Round-10 extension: the MinHash LSH band join has the same
    duplicate-family failure (the family shares ALL band signatures —
    one hot (band, bkt) class, quadratic candidates — while the shingle
    DF cap never fires: family shingle DF = 3,000 << 50k). Demonstrate
    the band-bucket cap on this corpus at cap=500 (production cap is
    structurally gate-invariant at 50k) and hash-prove it cross-engine;
    measure capped vs uncapped wall."""
    import duckdb

    from tools.check_oracle import frame_digest

    from daxos_spark.plans.docpipe import _lsh_candidates_oracle, d_lsh_candidates

    t0 = time.time()
    sdf = d_lsh_candidates(spark, out_dir, bucket_cap=PROBE_CAP).toPandas()
    t_cap = time.time() - t0
    spark.catalog.clearCache()
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    p = f"{out_dir}/documents.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pat}')")
    odf = con.execute(_lsh_candidates_oracle(bucket_cap=PROBE_CAP)).fetchdf()
    sn, sc, sh = frame_digest(sdf)
    on, oc, oh = frame_digest(odf)
    ok = (sn, sc, sh) == (on, oc, oh)
    print(
        f"{'PASS' if ok else 'FAIL'} d_lsh_candidates capped@{PROBE_CAP}: "
        f"spark n={sn} h={sh} ({t_cap:.1f}s) vs duckdb n={on} h={oh}"
    )
    t0 = time.time()
    d_lsh_candidates(spark, out_dir, bucket_cap=None).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"uncapped d_lsh_candidates wall: {time.time()-t0:.1f}s vs capped {t_cap:.1f}s")
    spark.catalog.clearCache()
    return ok


if __name__ == "__main__":
    raise SystemExit(main())
