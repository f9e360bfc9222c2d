"""Fixed-size-panel query variants + KMV small-slice fallback.

The panel variants (v_label_noise_panel, q_trajectory_knn_panel) pin
BOTH the panel-selection rule (smallest md5(id), ties by id — python
hashlib replication) and the scored semantics (brute-force numpy
replay) so the constant-size parameterization cannot silently drift
from the fraction-panel originals. The KMV test exercises the
n_distinct < k branch, where the estimator must BE the exact count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def test_label_noise_panel_selection_and_agreement(spark):
    from daxos_spark.plans.vecpipe2 import _PANEL_N, v_label_noise_panel

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    codes = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1000.0).astype(
        np.int64
    )
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()

    # the panel is the _PANEL_N ids with the smallest md5 hash
    order = sorted(range(len(ids)), key=lambda i: (_md5_long(str(ids[i])), ids[i]))
    panel = order[: _PANEL_N]
    assert len(panel) == _PANEL_N  # corpus (500) > panel size

    want: dict = {}
    for i in panel:
        scores = codes @ codes[i]
        cand = sorted(
            (j for j in range(len(ids)) if ids[j] != ids[i]),
            key=lambda j: (-scores[j], ids[j]),
        )[:5]
        n_agree = sum(1 for j in cand if labels[j] == labels[i])
        lab = int(labels[i])
        n, tot, fl = want.get(lab, (0, 0, 0))
        want[lab] = (n + 1, tot + n_agree, fl + (1 if n_agree <= 1 else 0))

    rows = v_label_noise_panel(spark, SF_DIR).collect()
    got = {r["label"]: (r["n_probes"], r["total_agree"], r["n_flagged"]) for r in rows}
    assert got == want
    assert sum(v[0] for v in got.values()) == _PANEL_N


def test_trajectory_panel_covers_fraction_probes(spark):
    """At this sf every user fits in the 32-slot panel, so the fixed
    variant's probe set is ALL users with a transition — a strict
    superset of the 10%-fraction variant, and the shared probes must
    produce identical top-3 rows (same scoring chain)."""
    from daxos_spark.plans.analytics import (
        _TRAJ_PANEL_N,
        q_trajectory_knn,
        q_trajectory_knn_panel,
    )

    frac = q_trajectory_knn(spark, SF_DIR).collect()
    fixed = q_trajectory_knn_panel(spark, SF_DIR).collect()

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    users_with_tr = {
        int(u) for u, n in ev.groupby("user_id").size().items() if n >= 2
    }
    fixed_pids = {r["pid"] for r in fixed}
    assert len(users_with_tr) <= _TRAJ_PANEL_N
    assert fixed_pids == users_with_tr

    key = lambda r: (r["pid"], r["cid"])
    fixed_by = {key(r): (r["num"], r["na"], r["nb"], r["cos"]) for r in fixed}
    for r in frac:
        assert fixed_by[key(r)] == (r["num"], r["na"], r["nb"], r["cos"])


def test_kmv_small_slice_exact_fallback(spark):
    """sf0.001's slice has ~123 < 256 distinct parts: the sketch holds
    the whole set, so the union estimate must equal the exact count and
    the Jaccard denominator must be the realized sketch size."""
    from daxos_spark.plans.relational2 import q_kmv_set_ops

    r = q_kmv_set_ops(spark, SF_DIR).collect()[0]
    assert r["exact_union"] < 256
    assert r["est_union"] == float(r["exact_union"])
    assert r["rel_err_union"] == 0.0
    assert abs(r["est_jaccard"] - r["exact_inter"] / r["exact_union"]) < 1e-6
    # est_inter is computed from the UNtruncated jaccard; the reported
    # jaccard is trunc6'd, so the replay tolerance is 1e-6 * est_union
    assert abs(r["est_inter"] - r["est_jaccard"] * r["est_union"]) < 1e-6 * r["est_union"] + 1e-9
