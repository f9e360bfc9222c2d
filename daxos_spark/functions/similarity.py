"""IVF-style approximate nearest neighbor over array<float> embeddings.

Scale path for similarity search (vecpipe's e_knn_bruteforce is the
correctness baseline): partition the corpus into coarse buckets around
centroids, then search only the ``nprobe`` most promising buckets per
query. Corpus scan cost drops from O(N) to O(N · nprobe / n_buckets)
per query; the bucket assignment is a narrow broadcast-join pass, and
the probe join is an equi-join on bucket id — both shuffle-light and
AQE-friendly at 100 TB.

Centroids here are per-label means (deterministic; k-means would slot
in identically — the assignment/probe machinery doesn't care where
centroids come from). All means go through exact DECIMAL sums so the
duckdb oracle reproduces them bit-for-bit. Norms are computed ONCE per
vector and carried as columns — the naive cosine would re-aggregate
both self-dots for every pair (3× the per-pair work) for the same
bit-identical result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .vectors import dot, l2_norm, to_double


def _mean_decimal(col: Column) -> Column:
    """Order-independent mean (exact decimal sum / count)."""
    return F.sum(col.cast("decimal(25,6)")).cast("double") / F.count(F.lit(1))


def label_centroids(corpus: DataFrame, vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Per-label mean vectors: (bucket, cv: array<double>, cnorm).

    posexplode → per-(label, pos) decimal mean → re-assembled in pos
    order. One shuffle on (label, pos); centroid count is tiny, so the
    result broadcasts everywhere downstream.
    """
    per_dim = (
        corpus.select(label_col, F.posexplode(to_double(F.col(vec_col))).alias("pos", "val"))
        .groupBy(label_col, "pos")
        .agg(_mean_decimal(F.col("val")).alias("m"))
    )
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(F.col(label_col).alias("bucket"), F.transform("pm", lambda x: x["m"]).alias("cv"))
        .withColumn("cnorm", l2_norm(F.col("cv")))
    )


def assign_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach each corpus vector to its nearest centroid by cosine
    (ties broken by bucket id). Broadcast the centroids; one narrow
    pass over the corpus, no shuffle of the corpus itself. Output
    carries the vector's own norm for downstream probe scoring."""
    v = corpus.select(
        id_col, to_double(F.col(vec_col)).alias("__v")
    ).withColumn("vnorm", l2_norm(F.col("__v")))
    scored = v.join(F.broadcast(centroids)).select(
        id_col,
        "__v",
        "vnorm",
        "bucket",
        (dot(F.col("__v"), F.col("cv")) / (F.col("vnorm") * F.col("cnorm"))).alias("ccos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("bucket"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("__v").alias("cv_vec"), "vnorm", "bucket")
    )


def ivf_search(
    queries: DataFrame,
    corpus_bucketed: DataFrame,
    centroids: DataFrame,
    nprobe: int = 3,
    k: int = 5,
    qid_col: str = "qid",
    qvec_col: str = "qv",
    cid_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` nearest buckets per query, exact top-k
    inside them. Returns (qid, rk, neighbor_id) — ints only, so the
    result is float-tie-proof for the correctness gate."""
    q = queries.withColumn("qn", l2_norm(F.col(qvec_col)))
    probes = q.join(F.broadcast(centroids)).select(
        qid_col,
        qvec_col,
        "qn",
        "bucket",
        (dot(F.col(qvec_col), F.col("cv")) / (F.col("qn") * F.col("cnorm"))).alias("ccos"),
    )
    wp = Window.partitionBy(qid_col).orderBy(F.col("ccos").desc(), F.col("bucket"))
    probed = probes.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") <= nprobe)
    cand = probed.select(qid_col, qvec_col, "qn", "bucket").join(corpus_bucketed, "bucket")
    scored = cand.select(
        qid_col,
        F.col(cid_col).alias("neighbor_id"),
        (dot(F.col(qvec_col), F.col("cv_vec")) / (F.col("qn") * F.col("vnorm"))).alias("cos"),
    )
    wk = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select(qid_col, "rk", "neighbor_id")
    )


# --------------------------------------------------------------------- LSH

LSH_BITS = 8
LSH_DIM = 64


def lsh_planes(bits: int = LSH_BITS, dim: int = LSH_DIM) -> list[list[int]]:
    """Deterministic random-hyperplane weights, W[bit][dim] ∈ [-9, 9].

    md5-derived so Spark, the duckdb oracle, and any re-run agree on the
    exact same hyperplanes without shipping state. Integer weights keep
    every signature decision in exact arithmetic (no float sign flips at
    the bucket boundary between engines).
    """
    import hashlib

    return [
        [(int(hashlib.md5(f"lsh:{b}:{j}".encode()).hexdigest(), 16) % 19) - 9 for j in range(dim)]
        for b in range(bits)
    ]


def int_code(vec: Column) -> Column:
    """array<double> → array<bigint> via floor(x * 1000): the fixed-point
    code both the signature and the ranking score are computed on.
    float→double is exact, so the code is identical in every engine."""
    return F.transform(vec, lambda x: F.floor(x * F.lit(1000.0)))


def lsh_bucket(code: Column, planes: list[list[int]]) -> Column:
    """Signature bucket: bit b = [⟨code, W_b⟩ ≥ 0], packed little-endian.

    All-integer dot products (values ≲ 5e3 · 9 · 64 ≈ 3e6 — exact in
    64-bit) so the sign, and therefore the bucket, is deterministic.

    The plane matrix goes in as ONE nested-array literal and the bits
    are folded with HOFs — a per-element literal tree (B × D CreateArray
    nodes) costs seconds of Catalyst analysis per plan build, which
    dominated the benchmark before data even moved.
    """
    planes_lit = F.lit([[int(x) for x in w] for w in planes]).cast("array<array<bigint>>")
    pow2 = F.lit([1 << b for b in range(len(planes))]).cast("array<int>")
    bits = F.transform(
        planes_lit,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(code, plane, lambda a, ww: a * ww),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(
        F.zip_with(bits, pow2, lambda bit, pw: bit * pw), F.lit(0), lambda acc, v: acc + v
    )


def lsh_probe_buckets(bucket: Column, bits: int = LSH_BITS) -> Column:
    """Multiprobe set: the home bucket plus every single-bit flip —
    recovers neighbors that landed just across one hyperplane."""
    return F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << b)) for b in range(bits)])
