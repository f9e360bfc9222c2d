"""Static guard for the cache-lifetime discipline (rounds 5-6): every
function in daxos_spark/plans that persists more than it unpersists
must either be a *_lazy/shared helper whose callers release the caches,
or expose the persist= kwarg whose default path checkpoints the output
and releases every cache (registry.checkpoint_release). A new query
that leaks a persist() fails here before it ever reaches a review."""

from __future__ import annotations

import pathlib
import re

PLANS = pathlib.Path(__file__).resolve().parent.parent / "daxos_spark" / "plans"

# helpers whose persisted relations are released by their CALLERS
# (they return the cache handle alongside the result)
CALLER_RELEASED = {
    "_jaccard_edge_pairs",
    "_ss_position_stream",
    "_bigram_scored",
    "_kn_doc_nll",
    "_semdedup_marks",
    "_semantic_pairs",
    "_lr_pipeline",
    "_bm25_lazy",
    "_bpe_learn",
}


def test_no_unreleased_persists():
    offenders = []
    for p in sorted(PLANS.glob("*.py")):
        for chunk in re.split(r"\ndef ", p.read_text()):
            name = chunk.split("(")[0].strip()
            # the signature may span lines (black reflows long ones):
            # header = everything up to the def's closing "):" / ") ->:"
            m = re.search(r"\)\s*(?:->[^:]*)?:", chunk)
            header = chunk[: m.end()] if m else chunk.partition("\n")[0]
            full = chunk
            n_p = full.count(".persist()")
            n_u = full.count(".unpersist()")
            if n_p <= n_u:
                continue
            if name in CALLER_RELEASED or name.endswith("_lazy"):
                continue
            if "persist: bool = True" in header and "checkpoint_release" in full:
                continue
            offenders.append(f"{p.name}:{name} (+{n_p - n_u})")
    assert not offenders, (
        "unreleased persist() outside the discipline: " + ", ".join(offenders)
    )


def test_checkpointing_queries_expose_lazy_plans():
    """Every query source that uses checkpoint_release must register at
    least as many lazy_plan hooks as eager checkpointers — plan_audit
    must never be left looking at a post-checkpoint RDD scan. The bound
    is exact (no slack): a file may legitimately have MORE hooks than
    call sites (several queries sharing one checkpointing helper each
    register their own hook), never fewer."""
    for p in sorted(PLANS.glob("*.py")):
        src = p.read_text()
        n_ck = src.count("checkpoint_release(")
        n_hooks = src.count(".lazy_plan = ")
        # imports/definition lines don't count
        n_ck -= src.count("import checkpoint_release") + src.count(
            "def checkpoint_release"
        )
        if n_ck > 0:
            assert n_hooks >= n_ck, (p.name, n_ck, n_hooks)
