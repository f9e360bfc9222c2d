"""Storage-layout operators (plans/layout.py): Z-order skipping audit,
compaction bin packing, domain-mixture reweighting.

The cross-engine value hashes are checked by tools/check_oracle.py;
these tests pin the SEMANTIC invariants the hashes alone don't show:
the Morton code is a correct bit interleave, Z-order actually prunes
where a single-column sort can't, the packing conserves bytes, and the
mixture weights are a monotone normalized reweighting.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from daxos_spark.plans.layout import (
    q_compaction_plan,
    q_zorder_skipping,
    t_domain_mixture,
    z_interleave8,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_interleave8(x: int, y: int) -> int:
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_interleave_matches_reference_impl(spark):
    pts = [(0, 0), (255, 255), (255, 0), (0, 255), (1, 2), (170, 85), (200, 13)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", z_interleave8(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_interleave8(x, y)
    assert got[(0, 0)] == 0
    assert got[(255, 255)] == 65535


def test_zorder_prunes_where_single_column_sort_cannot(spark):
    rows = {(r.layout, r.probe): r for r in q_zorder_skipping(spark, SF_DIR).collect()}
    assert len(rows) == 6
    # insert-order layout prunes nothing on either probe
    assert rows[("natural", "box2d")].files_hit == rows[("natural", "box2d")].n_files
    # both clustered layouts beat insert order on the 2-D box
    assert rows[("zorder", "box2d")].files_hit < rows[("natural", "box2d")].files_hit
    assert rows[("partkey", "box2d")].files_hit < rows[("natural", "box2d")].files_hit
    # the Z-order raison d'être: on the suppkey-only probe the partkey
    # sort cannot prune at all, the Morton layout still does
    sk_pk = rows[("partkey", "sk_only")]
    sk_z = rows[("zorder", "sk_only")]
    assert sk_pk.files_hit == sk_pk.n_files
    assert sk_z.files_hit < sk_z.n_files
    # min/max pruning is sound: hit files always contain every match
    for r in rows.values():
        assert r.rows_in_hit_files >= r.match_rows


def test_compaction_plan_conserves_and_bounds(spark):
    from daxos_spark.catalog import load_tables

    bins = q_compaction_plan(spark, SF_DIR).collect()
    o = load_tables(spark, SF_DIR)["orders"]
    inventory = (
        o.groupBy(F.date_trunc("month", "o_orderdate"), "o_orderstatus")
        .count()
        .select((F.col("count") * 128).alias("size_bytes"))
        .collect()
    )
    # every file lands in exactly one bin; bytes conserved
    assert sum(b.n_files for b in bins) == len(inventory)
    assert sum(b.bin_bytes for b in bins) == sum(r.size_bytes for r in inventory)
    # next-fit by cumulative size: a bin overshoots the target by less
    # than one file (its last file crossed the boundary)
    target = 65536
    max_file = max(r.size_bytes for r in inventory)
    for b in bins:
        assert b.bin_bytes < target + max_file
    # bins are dense 0..n-1
    assert sorted(b.bin_id for b in bins) == list(range(len(bins)))


def test_domain_mixture_is_monotone_normalized(spark):
    rows = t_domain_mixture(spark, SF_DIR).collect()
    assert len(rows) > 1
    # weights normalize (trunc6 loses < 1e-6 per source)
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-6 * (len(rows) + 1)
    # multiplicative weights against the fixed baseline: strictly
    # monotone in excess loss
    by_loss = sorted(rows, key=lambda r: r.loss)
    weights = [r.weight for r in by_loss]
    assert weights == sorted(weights)
    # allocation adds up to at most the corpus token budget
    total_tokens = sum(r.src_tokens for r in rows)
    assert sum(r.token_alloc for r in rows) <= total_tokens
