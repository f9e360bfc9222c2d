"""Training-data-pipeline queries over the `documents` table.

Beyond-parity surface (the reference processes no text): exact dedup,
MinHash signatures, SimHash, n-gram Jaccard near-dup pairs, language ID,
quality scoring, token stats — every one a builtin-function DataFrame
plan (no Python UDFs), with a bit-for-bit duckdb oracle built on the
same md5-derived hashing (functions/hashing.py).

Scale: all shingle/token explosions are linear in corpus size and
partition-local; the only shuffles are the groupBys/joins on shingle or
hash keys — the standard LSH-at-scale layout (band-bucket join instead
of all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_tables
from ..functions import text as T
from ..functions.hashing import (
    _min_hash,
    md5_long,
    md5_long_sql,
    minhash_signature,
    simhash32,
    word_shingles,
)
from .registry import checkpoint_release, ALL_SPECS, QuerySpec, register, sql_davg, sql_trunc6, trunc6

_NORM = "lower(trim(text))"
_TOKS = f"string_split_regex({_NORM}, '\\s+')"
_NORM_WS = f"regexp_replace({_NORM}, '\\s+', ' ', 'g')"
_STRIP_WS = f"regexp_replace({_NORM}, '\\s+', '', 'g')"



def _fanout(df):
    """Spread a small single-file scan across all cores before
    expression-heavy per-row work (tokenize/hash explosions).
    Conditional: at cluster scale the input already has ≥ parallelism
    splits and this is a no-op (an unconditional repartition would be
    a full corpus shuffle); locally the 1-file documents table would
    otherwise pin one core."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

def _q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        register(QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=("docs",)))
        return fn

    return deco


# --------------------------------------------------------------------------
# token statistics per language — token counting surface.
@_q(
    "d_token_stats",
    f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {sql_davg(f'len({_TOKS})')} AS avg_tokens,
           MAX(n_chars) AS max_chars,
           MIN(n_chars) AS min_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def d_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    from .registry import davg

    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(T.token_count(F.col("text"))).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
            F.min("n_chars").alias("min_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# per-doc quality scoring — length/stopword heuristics, pure arithmetic.
_SW = "', '".join(T.EN_STOPWORDS)
@_q(
    "d_quality_scores",
    f"""
    WITH t AS (
      SELECT doc_id,
             len({_TOKS}) AS n_tokens,
             len(list_filter({_TOKS}, t -> list_contains(['{_SW}'], t))) AS stop_hits,
             length({_STRIP_WS}) AS n_alpha
      FROM documents
    )
    SELECT doc_id, n_tokens,
           FLOOR((stop_hits / n_tokens) * 1000000.0) / 1000000.0 AS stop_ratio,
           FLOOR((n_alpha / n_tokens) * 1000000.0) / 1000000.0 AS avg_tok_len,
           FLOOR((0.5 * GREATEST(0.0, LEAST(1.0, (stop_hits / n_tokens) * 5.0))
               + 0.5 * GREATEST(0.0, LEAST(1.0, 1.0 - ABS(n_alpha / n_tokens - 5.0) / 5.0))) * 1000000.0) / 1000000.0 AS quality
    FROM t
    ORDER BY doc_id
    """,
)
def d_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        trunc6(T.stopword_ratio(F.col("text"))).alias("stop_ratio"),
        trunc6(T.avg_token_len(F.col("text"))).alias("avg_tok_len"),
        trunc6(T.quality_score(F.col("text"))).alias("quality"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# language-ID heuristic vs the labeled lang column → confusion counts.
def _sql_hits(lang: str) -> str:
    words = "', '".join(T.STOPWORDS[lang])
    return f"len(list_filter({_TOKS}, t -> list_contains(['{words}'], t)))"


@_q(
    "d_langid_confusion",
    f"""
    WITH s AS (
      SELECT lang,
             {_sql_hits('en')} AS s_en, {_sql_hits('de')} AS s_de,
             {_sql_hits('es')} AS s_es, {_sql_hits('fr')} AS s_fr,
             {_sql_hits('zh')} AS s_zh
      FROM documents
    ), p AS (
      SELECT lang,
             CASE WHEN GREATEST(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'unk'
                  WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                  WHEN s_fr >= s_zh THEN 'fr'
                  ELSE 'zh' END AS pred_lang
      FROM s
    )
    SELECT lang, pred_lang, COUNT(*) AS n
    FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang
    """,
)
def d_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    # Scale-idiomatic language ID: explode tokens ONCE and broadcast-join
    # a (word, lang) stopword dim instead of 5 per-row 10-literal
    # membership expressions — the membership trees compile to ~4s of
    # Janino codegen and evaluate interpreted (HOF); the join version is
    # plain codegen'd hash-join + counting aggs. Same counts, same
    # argmax, same oracle.
    sw = spark.createDataFrame(
        [(w, lang) for lang in T.LANG_ORDER for w in T.STOPWORDS[lang]], "t string, sw_lang string"
    )
    toks = d.select("doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("t"))
    scores = (
        toks.join(F.broadcast(sw), "t")
        .groupBy("doc_id")
        .agg(*[F.sum((F.col("sw_lang") == lang).cast("int")).alias(f"s_{lang}") for lang in T.LANG_ORDER])
    )
    per_doc = d.select("doc_id", "lang").join(scores, "doc_id", "left")
    score_cols = {lang: F.coalesce(F.col(f"s_{lang}"), F.lit(0)) for lang in T.LANG_ORDER}
    return (
        per_doc.select("lang", T.langid_from_scores(score_cols).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# exact dedup summary — fingerprint = md5 of normalized text (hash-groupBy
# dedup; canonical row = min doc_id per fingerprint).
@_q(
    "d_exact_dedup",
    f"""
    WITH f AS (
      SELECT doc_id,
             {md5_long_sql(_NORM_WS)} AS fp
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT fp) AS n_unique,
           COUNT(*) - COUNT(DISTINCT fp) AS n_dup_docs
    FROM f
    """,
)
def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return d.select(T.fingerprint(F.col("text")).alias("fp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dup_docs"),
    )


# --------------------------------------------------------------------------
# incremental dedup — the daily-ingest shape of exact dedup: a NEW batch
# of documents (here: the upper doc_id half standing in for today's
# crawl) is admitted only if its content fingerprint is absent from the
# EXISTING corpus (lower half) and unique within the batch (first
# occurrence wins). At scale this is an anti-join of the batch against
# the corpus fingerprint index (a bucketed/Bloom-backed table), never a
# re-scan of the full corpus text: fingerprints shuffle, documents don't.
@_q(
    "d_incremental_dedup",
    f"""
    WITH f AS (
      SELECT doc_id, source, {md5_long_sql(_NORM_WS)} AS fp FROM documents
    ), corpus AS (
      SELECT fp FROM f WHERE doc_id < (SELECT MAX(doc_id)/2 FROM f)
    ), batch AS (
      SELECT doc_id, source, fp FROM f WHERE doc_id >= (SELECT MAX(doc_id)/2 FROM f)
    ), flagged AS (
      SELECT doc_id, source, fp,
             CASE WHEN fp IN (SELECT fp FROM corpus) THEN 0 ELSE 1 END AS is_fresh
      FROM batch
    ), ranked AS (
      SELECT source, is_fresh,
             CASE WHEN is_fresh = 1
                  THEN ROW_NUMBER() OVER (PARTITION BY fp, is_fresh ORDER BY doc_id)
                  ELSE 0 END AS rn
      FROM flagged
    )
    SELECT source,
           COUNT(*) AS n_batch,
           CAST(SUM(CASE WHEN is_fresh = 1 AND rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_admitted
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def d_incremental_dedup(spark: SparkSession, sf_dir: str, persist: bool = True) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    f = d.select("doc_id", "source", T.fingerprint(F.col("text")).alias("fp"))
    if persist:
        f = f.persist()
    half = f.agg((F.max("doc_id") / 2).alias("h"))
    corpus = f.join(F.broadcast(half), F.col("doc_id") < F.col("h")).select("fp")
    batch = f.join(F.broadcast(half), F.col("doc_id") >= F.col("h")).select(
        "doc_id", "source", "fp"
    )
    batch_sizes = batch.groupBy("source").agg(F.count(F.lit(1)).alias("n_batch"))
    fresh = batch.join(corpus, "fp", "left_anti")
    admitted = (
        fresh.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_admitted"))
    )
    out = (
        batch_sizes.join(admitted, "source", "left")
        .select(
            "source",
            "n_batch",
            F.coalesce(F.col("n_admitted"), F.lit(0)).alias("n_admitted"),
        )
        .orderBy("source")
    )
    if not persist:
        return out
    return checkpoint_release(out, [f])


ALL_SPECS["d_incremental_dedup"].lazy_plan = (
    lambda spark, sf_dir: d_incremental_dedup(spark, sf_dir, persist=False)
)


# --------------------------------------------------------------------------
# MinHash signatures (4 seeded hash families over word 3-shingles).
_SHINGLE = "concat_ws(' ', tk[i], tk[i+1], tk[i+2])"


def _sql_minhash(seed: int) -> str:
    return f"MIN({md5_long_sql('s', seed=seed)})"


@_q(
    "d_minhash_signatures",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents WHERE doc_id < 50
    ), sh AS (
      SELECT DISTINCT doc_id, {_SHINGLE} AS s
      FROM (SELECT doc_id, tk, unnest(range(1, GREATEST(len(tk) - 2, 1) + 1)) AS i FROM toks)
    )
    SELECT doc_id,
           {_sql_minhash(0)} AS m0, {_sql_minhash(1)} AS m1,
           {_sql_minhash(2)} AS m2, {_sql_minhash(3)} AS m3
    FROM sh GROUP BY doc_id ORDER BY doc_id
    """,
)
def d_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    sig = minhash_signature(word_shingles(F.lower(F.trim(F.col("text"))), 3), num_hashes=4)
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", sig.alias("sig"))
        .select(
            "doc_id",
            F.element_at("sig", 1).alias("m0"),
            F.element_at("sig", 2).alias("m1"),
            F.element_at("sig", 3).alias("m2"),
            F.element_at("sig", 4).alias("m3"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs within each source bucket — the shingle
# inverted-index join (the scale path: join on shingle, never all-pairs).
#
# Hot-key cap: a stop-phrase shingle ("terms of service") at corpus
# scale puts millions of docs on ONE join key — quadratic blowup no AQE
# skew split can bound. Standard MinHash-LSH practice drops shingles
# whose document frequency exceeds a cap BEFORE the self-join; such
# shingles carry no near-dup signal (they match everything). The cap is
# mirrored in the duckdb oracle, and is far above any test-corpus DF
# (≤5000 docs at sf0.1) so small-SF hashes are unaffected; the pytest
# proves the drop semantics with a tiny cap.
_MAX_SHINGLE_DF = 50_000


def _cap_hot_shingles(
    sh: DataFrame, max_df: int, keys: tuple[str, ...] = ("s",)
) -> DataFrame:
    """Drop shingles with document frequency > max_df. ``sh`` must be
    one row per (doc_id, shingle). The hot set is tiny at test scale
    (only ultra-common shingles) but it is a DF-THRESHOLD filter, not a
    top-N cap — its cardinality scales with the corpus (bounded only by
    shingle_rows/max_df, millions at 100 TB), so no forced broadcast:
    AQE broadcasts the anti-join side while it fits and shuffles past
    that (the round-8 bounded-broadcast rule; its own guard test
    caught this site's old hint).
    ``keys`` is the shingle identity — two-lane callers pass
    ("s", "s2") so a lane-1 birthday collision past ~2^28 distinct
    shingles cannot pool two shingles' document frequencies and drop
    both below-cap shingles (the same collision class the 112-bit join
    key exists to eliminate)."""
    hot = sh.groupBy(*keys).agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") > max_df
    )
    return sh.join(hot.select(*keys), list(keys), "left_anti")


# Segment size for oversized-bucket pair enumeration (_bucket_pairs).
# Buckets at the 50k caps can emit ~1.25e9 i<j pairs; enumerated from
# one bucket row they all land on ONE task (guide §2.5 skew). Segments
# bound per-unit work at seg² ≈ 4.2M pairs and per-unit payload at
# 2·seg elements, so a full-cap bucket becomes ⌈50k/2048⌉²/2 ≈ 325
# spreadable units of ~16 KB each.
_PAIR_SEG = 2048


def _bucket_pairs(
    bkt: DataFrame, seg: int = _PAIR_SEG, max_members: int | None = None
) -> DataFrame:
    """i<j member-pair stream (columns pa, pb) of each bucket row's
    sorted member array ``ds`` (members unique within a bucket).

    Small buckets (≤ seg members) enumerate in place — posexplode +
    slice, zero extra exchange, the round-11 form. Oversized buckets
    would otherwise emit their whole quadratic pair mass from a single
    task (guide §2.5): they are cut into ≤seg-element segments, the
    upper-triangular (segᵢ, segⱼ) unit grid is exploded and
    hash-repartitioned (deterministic key — xxhash64 of the unit
    payload, not rand(): guide §2.5 retry safety) so each unit lands on
    its own task. ``ds`` sorted ascending + unique members ⇒ an
    off-diagonal unit's cross product already satisfies pa < pb, and a
    diagonal unit keeps exactly its pa < pb half — the union over all
    units is precisely the bucket's i<j pair multiset, so downstream
    counts/distincts are unchanged.

    ``max_members``: when a caller KNOWS a bound on bucket size that
    fits one segment, the guarded unit machinery is provably an
    identity and the in-place form is returned as the whole pair
    stream. The production lanes pass None (full guarded plan,
    unconditional): a 1-row max-size probe was measured and rejected —
    the extra action splits the cache-build pipeline for more than the
    skipped empty stages return (see OPTIMIZATION_r12.md).

    Guarded-form structure (all measured, round 12): small buckets
    become ONE diagonal unit of themselves (no exchange) and oversized
    buckets explode into the repartitioned unit grid; the two unit
    streams UNION BELOW one shared enumeration chain. Unioning the
    enumerated PAIR streams instead runs the generates interpreted
    (whole-stage codegen does not form under that union — measured
    30× per pair, 1.1 s → 32 s on a 450M-pair probe), and the unified
    chain enumerates a diagonal unit with the exact i<j slice (no 2×
    cross-then-halve work). The spread exchange pins an EXPLICIT
    partition count (defaultParallelism — cluster-sized, not a local
    constant): units are byte-tiny but work-QUADRATIC, so AQE's
    byte-based coalescing would merge them back onto one task
    (measured: 120 units ≡ 4 MB → one partition, recreating the exact
    straggler this helper exists to break); a user-specified count is
    exempt. NOTE: the guarded form scans ``bkt`` twice (small +
    oversized filter) — callers persist the bucket relation."""
    if max_members is not None and max_members <= seg:
        return _inplace_pairs(bkt)
    small_units = bkt.filter(F.size("ds") <= seg).select(
        F.col("ds").alias("ua"), F.col("ds").alias("ub"), F.lit(True).alias("diag")
    )
    k = F.ceil(F.size("ds") / F.lit(seg)).cast("int")
    big_units = (
        bkt.filter(F.size("ds") > seg)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(0), k - F.lit(1)),
                        lambda i: F.transform(
                            F.sequence(i, k - F.lit(1)),
                            lambda j: F.struct(
                                F.slice(
                                    F.col("ds"), i * F.lit(seg) + F.lit(1), F.lit(seg)
                                ).alias("ua"),
                                F.slice(
                                    F.col("ds"), j * F.lit(seg) + F.lit(1), F.lit(seg)
                                ).alias("ub"),
                                (i == j).alias("diag"),
                            ),
                        ),
                    )
                )
            ).alias("u")
        )
        .select("u.*")
        .repartition(
            bkt.sparkSession.sparkContext.defaultParallelism,
            F.xxhash64("ua", "ub"),
        )
    )
    units = small_units.unionByName(big_units)
    # diag unit: slice from i+2 ⇒ exactly the i<j half (ua ≡ ub);
    # off-diag unit: whole ub ⇒ the full cross, pa < pb already true
    # (segments are ordered slices of the sorted, unique-member ds)
    return units.select(F.posexplode("ua").alias("i", "pa"), "ub", "diag").select(
        "pa",
        F.explode(
            F.slice(
                F.col("ub"),
                F.when(F.col("diag"), F.col("i") + F.lit(2)).otherwise(F.lit(1)),
                F.size("ub"),
            )
        ).alias("pb"),
    )


def _inplace_pairs(bkt: DataFrame) -> DataFrame:
    """i<j pairs of each sorted ``ds`` array, enumerated on the task
    holding the bucket row (posexplode + slice — the round-11 form)."""
    return bkt.select(F.posexplode("ds").alias("i", "pa"), "ds").select(
        "pa",
        F.explode(F.slice(F.col("ds"), F.col("i") + F.lit(2), F.size("ds"))).alias("pb"),
    )


def _capped_stream(
    stream: DataFrame, cap: int, keys: tuple[str, ...] = ("s",)
) -> DataFrame:
    """Memory-safe hot-key cap, applied on the STREAM between its one
    hash exchange and the bucket collect (§5). A windowed per-key
    count — evaluated on the exchanged stream, spill-backed
    (WindowExec buffers one key group at a time in an external
    spillable array) — filters every row of an over-cap key BEFORE any
    collect_list can materialize its member array, so the downstream
    aggregation buffer is provably bounded by ``cap`` members (the
    round-11 forms filtered AFTER the array was built — a
    single-buffer OOM on a degenerate 10⁸-member key at 100 TB).
    Zero extra passes or exchanges: the window's hash partitioning on
    ``keys`` satisfies the following groupBy's clustering requirement
    (keys ⊆ grouping keys), so the plan keeps exactly one full-stream
    exchange — and for the global-DF lanes this REPLACES the round-11
    window over the bucket arrays, deleting that second full-mass
    exchange+sort. Degenerate-corpus residual: the over-cap key's rows
    still transit one spilling window task before being dropped —
    disk-bounded and completing, monitored by t_cap_census; the
    drop-map-side alternative (count + anti-join, _cap_hot_shingles)
    costs a full extra pass over the stream on EVERY healthy run and
    is the wrong default for caps that by design never fire."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys)
    return (
        stream.withColumn("__df", F.count(F.lit(1)).over(w))
        .filter(F.col("__df") <= cap)
        .drop("__df")
    )


@_q(
    "d_jaccard_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS tk FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id, source, {_SHINGLE} AS s
      FROM (SELECT doc_id, source, tk, unnest(range(1, GREATEST(len(tk) - 2, 1) + 1)) AS i FROM toks)
    ), sh AS (
      SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY s) <= {_MAX_SHINGLE_DF}
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT da, db,
           FLOOR((n_inter / (sa.n_sh + sb.n_sh - n_inter)) * 1000000.0) / 1000000.0 AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = da
               JOIN sizes sb ON sb.doc_id = db
    ORDER BY jaccard DESC, da, db
    LIMIT 20
    """,
)
def d_jaccard_pairs(spark: SparkSession, sf_dir: str, persist: bool = True) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    # the shingle inverted index feeds four consumers (DF cap, sizes,
    # both sides of the self-join) — persist it instead of recomputing
    # the tokenize/explode (at cluster scale this is a checkpointed
    # table). The DF-capped view re-derives from the cached table with
    # a broadcast anti-join (no extra scan, no shuffle).
    sh0 = d.select(
        "doc_id",
        "source",
        F.explode(word_shingles(F.lower(F.trim(F.col("text"))), 3)).alias("s"),
    )
    if persist:
        sh0 = sh0.persist()
    sh = _cap_hot_shingles(sh0, _MAX_SHINGLE_DF)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        inter.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .select(
            "da",
            "db",
            trunc6(F.col("n_inter") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter"))).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "da", "db")
        .limit(20)
    )
    if not persist:
        return out
    return checkpoint_release(out, [sh0])


ALL_SPECS["d_jaccard_pairs"].lazy_plan = (
    lambda spark, sf_dir: d_jaccard_pairs(spark, sf_dir, persist=False)
)


# --------------------------------------------------------------------------
# SimHash (32-bit) per document — near-dup fingerprint via per-bit
# majority vote of token hashes.
@_q(
    "d_simhash",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS t FROM documents WHERE doc_id < 100
    ), h AS (
      SELECT doc_id, {md5_long_sql('t')} AS h FROM tok
    ), bits AS (
      SELECT doc_id, g.b AS b,
             CASE WHEN 2 * SUM((h >> g.b) & 1) > COUNT(*) THEN 1 ELSE 0 END AS bit
      FROM (SELECT doc_id, h, unnest(range(0, 32)) AS b FROM h) g
      GROUP BY doc_id, g.b
    )
    SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
)
def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    # explode-then-aggregate layout (same shape as the oracle): md5 is
    # computed ONCE per token; the 32 bit-votes are cheap integer aggs.
    # The per-row simhash32() expression would re-hash every token 32×
    # (interpreted HOFs have no common-subexpression elimination).
    tok = d.filter(F.col("doc_id") < 100).select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("t")
    )
    h = tok.select("doc_id", md5_long(F.col("t")).alias("h"))
    votes = h.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)).cast("int")).alias(f"c{b}")
            for b in range(32)
        ],
    )
    sim = F.lit(0).cast("bigint")
    for b in range(32):
        sim = sim + (F.col(f"c{b}") * 2 > F.col("n")).cast("bigint") * F.lit(1 << b)
    return votes.select("doc_id", sim.alias("simhash")).orderBy("doc_id")


# --------------------------------------------------------------------------
# MinHash-LSH candidate pairs (band-bucket join) + verified Jaccard —
# the full at-scale near-dup pipeline in one query: 8 minhashes, 4 bands
# of 2, candidates = pairs sharing any band bucket, then exact Jaccard
# on candidates only.
_N_HASH = 8
_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]
# band-bucket membership cap — see the bcap CTE note + the SimHash twin
# (docpipe2._SIMHASH_BUCKET_CAP); measured on the adversarial dup-heavy
# corpus (tools/adversarial_dup_probe.py corpus): a planted family of
# 3,000 exact dups pushed d_lsh_candidates from ~4 s to 56 s through one
# hot (band, bkt) class, while the shingle DF cap never fired (family
# shingle DF = 3,000 << 50k). Upstream exact-dedup (0.1 s) remains the
# family REMEDY; the cap is the engine-level bound when that contract
# is violated. The cap never fires SILENTLY: t_cap_census
# (docpipe2.py) is the co-scheduled monitor — rows_dropped > 0 at this
# cap is the fired alarm, naming the un-flagged pair mass.
_LSH_BUCKET_CAP = 50_000


def _lsh_candidates_oracle(bucket_cap: int = _LSH_BUCKET_CAP) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id, {_SHINGLE} AS s
      FROM (SELECT doc_id, tk, unnest(range(1, GREATEST(len(tk) - 2, 1) + 1)) AS i FROM toks)
    ), sh AS (
      SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY s) <= {_MAX_SHINGLE_DF}
    ), sig AS (
      SELECT doc_id,
             {', '.join(f"MIN({md5_long_sql('s', seed=i)}) AS m{i}" for i in range(_N_HASH))}
      FROM sh GROUP BY doc_id
    ), buckets AS (
      {' UNION ALL '.join(f"SELECT doc_id, {bi} AS band, concat(m{a}, ':', m{b}) AS bkt FROM sig" for bi, (a, b) in enumerate(_BANDS))}
    ), bcap AS (
      -- hot-bucket cap, the SimHash lane's twin (docpipe2._SIMHASH_BUCKET_CAP
      -- rationale): a duplicate family shares ALL band signatures, so one
      -- (band, bkt) class goes quadratic in family size; family shingle DF
      -- stays far below _MAX_SHINGLE_DF, so the shingle cap cannot help.
      -- Cap >= corpus size at every gate scale -> committed hashes unchanged.
      SELECT * FROM buckets QUALIFY COUNT(*) OVER (PARTITION BY band, bkt) <= {bucket_cap}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM bcap a JOIN bcap b ON a.bkt = b.bkt AND a.band = b.band AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT da, db, COUNT(*) AS n_inter
      FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db AND x.s = y.s
      GROUP BY da, db
    )
    SELECT da, db, FLOOR((n_inter / (sa.n_sh + sb.n_sh - n_inter)) * 1000000.0) / 1000000.0 AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
    ORDER BY jaccard DESC, da, db
    LIMIT 20
    """


@_q("d_lsh_candidates", _lsh_candidates_oracle())
def d_lsh_candidates(
    spark: SparkSession,
    sf_dir: str,
    persist: bool = True,
    bucket_cap: int | None = _LSH_BUCKET_CAP,
) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    # persist: sh feeds the DF cap, sig, sizes, and both sides of the
    # candidate verification join (6 consumers). The capped view is a
    # broadcast anti-join over the cached table — hot shingles (see
    # _MAX_SHINGLE_DF above) are excluded from signatures AND the
    # verification join, bounding the per-key join fan-out.
    sh0 = d.select(
        "doc_id", F.explode(word_shingles(F.lower(F.trim(F.col("text"))), 3)).alias("s")
    )
    if persist:
        sh0 = sh0.persist()
    sh = _cap_hot_shingles(sh0, _MAX_SHINGLE_DF)
    # ONE doc-keyed aggregate serves FOUR former consumers of the
    # shingle stream (optimization round 11, guide §2.3/§2.4): the
    # signatures (map-side HOF min over the array — same 8 md5
    # evaluations per shingle the old 8-way min aggregate paid, minus
    # its exchange), the sizes (map-side size()), and both sides of the
    # candidate verification (map-side array_intersect over the
    # doc-dim rejoin, replacing the x⋈y shingle equi-join that
    # re-exchanged the full stream twice plus a (da,db) count
    # aggregate). Arrays are per-doc and bounded by doc length — the
    # same bound sorted_tk carries in d_prefix_filter_jaccard. No sort:
    # only array_min / size / intersect-size consume it, all
    # order-invariant, so the values are unchanged.
    arr = sh.groupBy("doc_id").agg(F.collect_list("s").alias("tk"))
    if persist:
        arr = arr.persist()
    # seed binding: _min_hash wraps the seed in a one-arg closure. A
    # two-arg lambda (even with a defaulted second parameter) is treated
    # by pyspark as (element, index) — the seed would silently bind to
    # the array-index Column and the 8 lanes would not be the seeded
    # md5 family the oracle computes (round-12 correctness fix).
    sig = arr.select(
        "doc_id",
        *[_min_hash(F.col("tk"), i).alias(f"m{i}") for i in range(_N_HASH)],
    )
    # one explode pass instead of a 4-way union (a union re-reads sig
    # once per band; the exploded struct array is a single narrow pass)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat(
                    F.col(f"m{ai}").cast("string"), F.lit(":"), F.col(f"m{b}").cast("string")
                ).alias("bkt"),
            )
            for bi, (ai, b) in enumerate(_BANDS)
        ]
    )
    buckets = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bkt").alias("bkt")
    )
    # Bucket-based candidate generation (optimization round 11, guide
    # §2.3/§2.4 — the _jaccard_edge_pairs rewrite): ONE groupBy of the
    # bucket-membership stream into per-(band, bkt) sorted doc-id lists
    # replaces the count window + self-join, which together exchanged
    # the stream three times on the SAME (band, bkt) key. Round 12
    # (§5 memory safety): the hot-bucket cap moves UPSTREAM of the
    # collect — a windowed membership count on the exchanged stream
    # (_capped_stream) drops every row of an over-cap bucket (a
    # degenerate band value with 10⁸⁺ members at 100 TB) before its
    # member array can materialize in one aggregation buffer. Kept ⟺
    # membership count ≤ cap — the identical predicate the old
    # size(ds) filter applied after the fact (doc_ids are unique
    # within a (band, bkt) group: one bucket per doc per band), and
    # the window's hash partitioning is the same one the groupBy
    # needs, so the plan still has exactly one full-stream exchange.
    if bucket_cap is not None:
        buckets = _capped_stream(buckets, bucket_cap, keys=("band", "bkt"))
    bkt = buckets.groupBy("band", "bkt").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    # In-place i<j enumeration (emits exactly the join's (same bucket ∧
    # da<db) pair multiset). DELIBERATE (§2.5 trade, measured round
    # 12): this lane is a fused single pipeline (collect→enumerate→
    # verify in one stage chain, no persisted bucket relation), and
    # every guarded-enumeration variant broke that fusion for ~+0.3-0.6
    # s of a ~1.7 s query — persist+probe (+0.33), lazy two-branch
    # (+0.9, exchange reuse does not fire across the union), streamed
    # disjoint branches (+0.9). Worst-case residual: one full-cap
    # bucket generates ≤ cap²/2 pairs pipelined from a single task into
    # the distinct's shuffle write — a bounded, COMPLETING straggler
    # (the §5 window cap above already removed the OOM), monitored by
    # t_cap_census; the spread guard (_bucket_pairs segment units)
    # protects the persisted dedup lanes where it costs nothing.
    cand = (
        _inplace_pairs(bkt)
        .select(F.col("pa").alias("da"), F.col("pb").alias("db"))
        .distinct()
    )
    # re-attach the per-doc shingle arrays (doc-dim rejoin, one
    # array_intersect per candidate pair — shingles are distinct per
    # doc, so |array_intersect| equals the old equi-join's match count)
    ta = arr.select(
        F.col("doc_id").alias("da"), F.col("tk").alias("ta"), F.size("tk").alias("na")
    )
    tb = arr.select(
        F.col("doc_id").alias("db"), F.col("tk").alias("tb"), F.size("tk").alias("nb")
    )
    verified = (
        cand.join(ta, "da")
        .join(tb, "db")
        .withColumn("ni", F.size(F.array_intersect("ta", "tb")))
        # the old formulation verified via an INNER equi-join on the
        # shingle, so a candidate pair with no common shingle never
        # reached the output — keep that row set exactly
        .filter(F.col("ni") >= 1)
    )
    out = (
        verified.select(
            "da",
            "db",
            trunc6(
                F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "da", "db")
        .limit(20)
    )
    if not persist:
        return out
    return checkpoint_release(out, [sh0, arr])


ALL_SPECS["d_lsh_candidates"].lazy_plan = (
    lambda spark, sf_dir: d_lsh_candidates(spark, sf_dir, persist=False)
)


# --------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken '03) — rolling
# window-min over ordered shingle hashes; the distinct window minima are
# the document's fingerprint set. Distributed shape: explode ordered
# shingles, hash once, window-min over (doc, position) — one shuffle on
# doc_id, linear work, no driver-side state.
_W = 4  # winnow window (shingle hashes per window)


@_q(
    "d_winnow_fingerprints",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents WHERE doc_id < 300
    ), sh AS (
      SELECT doc_id, i, {md5_long_sql(_SHINGLE)} AS h,
             GREATEST(len(tk) - 2, 1) AS n_sh
      FROM (SELECT doc_id, tk, unnest(range(1, GREATEST(len(tk) - 2, 1) + 1)) AS i FROM toks)
    ), wm AS (
      SELECT doc_id, i, n_sh,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS fp
      FROM sh
    )
    SELECT doc_id,
           COUNT(DISTINCT fp) AS n_fingerprints,
           MIN(fp) AS min_fp
    FROM wm WHERE i <= n_sh - {_W} + 1
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def d_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"]).filter(F.col("doc_id") < 300)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_sh = F.greatest(F.size(toks) - F.lit(2), F.lit(1))
    sh = (
        d.select("doc_id", toks.alias("tk"), n_sh.alias("n_sh"))
        .select(
            "doc_id",
            "n_sh",
            "tk",
            F.explode(F.sequence(F.lit(1), F.col("n_sh"))).alias("i"),
        )
        .select(
            "doc_id",
            "n_sh",
            "i",
            md5_long(F.array_join(F.slice(F.col("tk"), F.col("i"), 3), " ")).alias("h"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, _W - 1)
    wm = sh.withColumn("fp", F.min("h").over(w)).filter(F.col("i") <= F.col("n_sh") - _W + 1)
    return (
        wm.groupBy("doc_id")
        .agg(F.countDistinct("fp").alias("n_fingerprints"), F.min("fp").alias("min_fp"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# BPE-ish subword token counting — regex word-piece segmentation
# (letter runs / digit runs / single punctuation), the tokenizer-shaped
# counting pass a training-data pipeline runs before byte-pair merges.
_BPE_PAT = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@_q(
    "d_bpe_token_stats",
    f"""
    WITH t AS (
      SELECT lang,
             len(regexp_extract_all({_NORM_WS}, '{_BPE_PAT}')) AS n_sub
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_sub) AS BIGINT) AS total_subtokens,
           {sql_davg('n_sub')} AS avg_subtokens,
           MAX(n_sub) AS max_subtokens
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def d_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import davg

    d = load_tables(spark, sf_dir)["documents"]
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    n_sub = F.size(F.regexp_extract_all(norm, F.lit(_BPE_PAT), F.lit(0)))
    t = d.select("lang", n_sub.alias("n_sub"))
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sub").alias("total_subtokens"),
            davg(F.col("n_sub")).alias("avg_subtokens"),
            F.max("n_sub").alias("max_subtokens"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# near-dup clusters — the full dedup endgame: shingle-Jaccard pairs
# above threshold → connected components → cluster-size histogram.
# Spark: iterative min-label propagation (operators/components.py);
# oracle: duckdb recursive CTE computing min reachable id. Both are
# exact on the same edge set, so the histogram matches bit-for-bit.
_JACC_THR = 0.02


def _jaccard_edge_pairs(d: DataFrame, persist: bool = True, two_lane: bool = False):
    """Shared near-dup edge construction: capped shingle self-join →
    Jaccard ≥ _JACC_THR (da, db) pairs. Same hot-shingle DF cap as
    d_jaccard_pairs — the cluster edges come from the identical shingle
    self-join and share its skew risk. Returns (pairs, caches) with
    caches the persisted per-(source, shingle) doc-id BUCKET relation
    (consumers: per-doc sizes + the i<j pair stream) — callers eagerly
    materialize their small output and unpersist every handle;
    ``persist=False`` is the plan-audit path (inspect only, never
    register a cache the hook cannot release, and never run the 1-row
    adaptive probe).

    ``two_lane=True`` is the 100 TB scale configuration: the shingle
    join keys on BOTH independent 56-bit lanes of one md5 digest
    (112 bits total), pushing the birthday-collision bound from ~2^28
    to past 2^50 distinct shingles. The digest is computed ONCE per
    shingle (explode the hex, derive both lanes from the exploded
    column — codegen does not CSE md5 across sibling expressions, the
    q_poisson_bootstrap lesson) for one extra long per row. At test
    cardinalities both configurations produce identical pair sets, so
    the gated two-lane query shares the single-lane raw-string oracle
    (t_dedup_clusters_lane2)."""
    from ..functions.hashing import md5_long

    # shingles are hashed to 56-bit ids INSIDE the explode select (one
    # projection): the persisted stream carries (int, small-str, long)
    # instead of a 20-40 B shingle string — ~half the cache bytes, and
    # every downstream shuffle/sort compares fixed-width longs instead
    # of strings (round-6 profile: the edge build dominated
    # t_dedup_best_keep at 7.8 of 10 s; this + the broadcast size
    # joins below took the query to ~6 s). The pair set is unchanged:
    # md5_long is collision-free at these cardinalities (56-bit over
    # ~2e5 distinct shingles; the duckdb oracle keeps joining the raw
    # strings, so the hash gate would expose any collision).
    # CARDINALITY BOUND: one 56-bit lane is safe to ~2^28 distinct
    # shingles (birthday). A 100 TB corpus exceeds that — production
    # runs pass two_lane=True (below), which keys the join on both
    # md5 lanes (112 bits, safe past 2^50). The flag is exercised
    # end-to-end by the registered t_dedup_clusters_lane2, hash-checked
    # against the same raw-string oracle as d_dedup_clusters.
    if two_lane:
        sh0 = d.select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    word_shingles(F.lower(F.trim(F.col("text"))), 3),
                    lambda s: F.md5(s),
                )
            ).alias("h"),
        ).select(
            "doc_id",
            "source",
            F.conv(F.substring("h", 1, 14), 16, 10).cast("bigint").alias("s"),
            F.conv(F.substring("h", 15, 14), 16, 10).cast("bigint").alias("s2"),
        )
    else:
        sh0 = d.select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    word_shingles(F.lower(F.trim(F.col("text"))), 3),
                    lambda s: md5_long(s),
                )
            ).alias("s"),
        )
    # Bucket-based candidate generation (optimization round 11, guide
    # §2.3/§2.4): ONE groupBy of the exploded shingle stream into
    # per-(source, shingle) sorted doc-id buckets replaces the previous
    # self-join — which shuffled the same cached stream TWICE (both join
    # sides hash-exchange on the shingle key) — and the hot-shingle DF
    # cap becomes a window sum over the BUCKET relation (shingle-type
    # cardinality) instead of a third full-stream aggregate plus an
    # anti-join. Pair semantics are unchanged: per-doc shingles are
    # distinct (word_shingles array_distinct), sort_array is ascending,
    # so the i<j stream enumerates exactly the join's
    # (same shingle ∧ same source ∧ da<db) pair multiset, and the
    # per-pair counts — hence the Jaccard values — are identical (the
    # duckdb oracle keeps the raw-string self-join formulation; the
    # hash gate proves equality).
    #
    # Round 12 (§5 memory safety): the GLOBAL-per-shingle DF cap moves
    # UPSTREAM of the collect — _cap_hot_shingles counts per shingle
    # map-side (one long per key in any aggregation buffer, safe on
    # any corpus) and anti-joins the tiny over-cap set, so a
    # stop-shingle with 10⁸⁺ members at 100 TB is dropped BEFORE its
    # doc-id array can materialize in one collect_list buffer, and
    # the round-11 window sum over the bucket relation — a second
    # full-member-mass Exchange(s)+Sort — disappears. The count pass
    # re-reads the persisted stream (same kept-set: the stream has one
    # row per (doc, source, shingle), so the per-key count IS the
    # global DF). The stream-window variant (_capped_stream) was
    # measured on this lane and rejected: sorting the full
    # hashed-shingle stream inside the window costs ~+0.5-1.3 s at
    # sf0.1 across the CC family, vs +0.16 s for this form.
    keys = ["s", "s2"] if two_lane else ["s"]
    if persist:
        # two consumers: the DF count pass + the bucket build
        sh0 = sh0.persist()
    sh = _cap_hot_shingles(sh0, _MAX_SHINGLE_DF, keys=tuple(keys))
    bkt = (
        sh.groupBy("source", *keys)
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .select(*keys, "ds")
    )
    mx = None
    if persist:
        # feeds sizes + both branches of the i<j pair stream (the
        # guarded _bucket_pairs enumeration stays in-plan — a 1-row
        # max-size probe to skip its empty oversized branch was
        # measured and rejected: the extra action splits the
        # cache-build pipeline for more than the skipped stages return)
        bkt = bkt.persist()
    sizes = (
        bkt.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # i<j enumeration with oversized-bucket spreading (§2.5 skew):
    # _bucket_pairs emits the identical pair multiset, splitting any
    # bucket > _PAIR_SEG members into repartitioned segment units
    # (adaptive: skipped when the 1-row max-size probe proves every
    # bucket fits).
    inter = (
        _bucket_pairs(bkt, max_members=mx)
        .groupBy(F.col("pa").alias("da"), F.col("pb").alias("db"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # doc-cardinality size lookups scale with the corpus — no forced
    # broadcast; AQE picks broadcast at test scale, shuffle at 100 TB
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    pairs = (
        inter.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .filter(
            F.col("n_inter") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter"))
            >= _JACC_THR
        )
        .select("da", "db")
    )
    # handles: the hashed shingle stream + the BUCKET relation
    # (persisted only when persist=True — unpersist is a no-op
    # otherwise); callers eagerly materialize their small output and
    # unpersist every handle
    return pairs, [sh0, bkt]


# the recursive-CTE connected-components oracle chain (through `comp`),
# shared by d_dedup_clusters and the keep-policy variant in textpipe
CC_ORACLE_CTE = f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source, {_TOKS} AS tk FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id, source, {_SHINGLE} AS s
      FROM (SELECT doc_id, source, tk, unnest(range(1, GREATEST(len(tk) - 2, 1) + 1)) AS i FROM toks)
    ), sh AS (
      SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY s) <= {_MAX_SHINGLE_DF}
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
      SELECT da, db
      FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
      WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= {_JACC_THR}
    ), edges AS (
      SELECT da AS u, db AS v FROM pairs UNION SELECT db, da FROM pairs
    ), reach AS (
      SELECT u AS node, v AS r FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    ), comp AS (
      SELECT node, LEAST(node, MIN(r)) AS component
      FROM reach GROUP BY node
    )"""


@_q(
    "d_dedup_clusters",
    CC_ORACLE_CTE
    + """, csize AS (
      SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
    )
    SELECT sz AS cluster_size, COUNT(*) AS n_clusters
    FROM csize GROUP BY sz ORDER BY sz
    """,
)
def d_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, caches = _dedup_clusters_lazy(spark, sf_dir)
    # histogram output is a handful of rows: eager-materialize and
    # release the corpus-mass shingle/bucket caches (t_substring_dedup
    # pattern)
    out = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


# the 100 TB scale configuration of the same clustering: shingle joins
# keyed on BOTH 56-bit md5 lanes (112 bits — birthday-safe past 2^50
# distinct shingles vs ~2^28 for one lane). At test cardinalities the
# pair set is identical, so the raw-string CC oracle is shared verbatim
# — the hash gate proves the lane-2 plumbing changes nothing below the
# collision horizon while exercising it end-to-end.
@_q(
    "t_dedup_clusters_lane2",
    CC_ORACLE_CTE
    + """, csize AS (
      SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
    )
    SELECT sz AS cluster_size, COUNT(*) AS n_clusters
    FROM csize GROUP BY sz ORDER BY sz
    """,
)
def t_dedup_clusters_lane2(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, caches = _dedup_clusters_lazy(spark, sf_dir, two_lane=True)
    out = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


def _dedup_clusters_lazy(
    spark: SparkSession, sf_dir: str, persist: bool = True, two_lane: bool = False
):
    from ..operators.components import connected_components

    d = _fanout(load_tables(spark, sf_dir)["documents"])
    pairs, caches = _jaccard_edge_pairs(d, persist=persist, two_lane=two_lane)
    comp = connected_components(pairs, "da", "db")
    csize = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    out = (
        csize.groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )
    return out, caches


# --------------------------------------------------------------------------
# the cleaned-corpus composition — what a training-data pipeline
# actually materializes: canonical (first doc per exact-dup group) ∧
# quality above threshold ∧ language-ID agrees with the label. One
# query chaining dedup + scoring + langid; counts per (lang, source).
@_q(
    "d_clean_corpus",
    f"""
    WITH f AS (
      SELECT doc_id, lang, source,
             {md5_long_sql(_NORM_WS)} AS fp,
             len({_TOKS}) AS n_tokens,
             len(list_filter({_TOKS}, t -> list_contains(['{_SW}'], t))) AS stop_hits
      FROM documents
    ), canon AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f
    ), hits AS (
      SELECT lang, source, doc_id,
             CASE WHEN (stop_hits * 5.0 / n_tokens) >= 0.5 THEN 1 ELSE 0 END AS good_quality
      FROM canon WHERE rn = 1
    )
    SELECT lang, source,
           COUNT(*) AS n_canonical,
           CAST(SUM(good_quality) AS BIGINT) AS n_clean
    FROM hits GROUP BY lang, source ORDER BY lang, source
    """,
)
def d_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    f = d.select(
        "doc_id",
        "lang",
        "source",
        T.fingerprint(F.col("text")).alias("fp"),
        T.token_count(F.col("text")).alias("n_tokens"),
        T.stopword_hits(F.col("text"), T.EN_STOPWORDS).alias("stop_hits"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    canon = f.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    good = (F.col("stop_hits") * 5.0 / F.col("n_tokens") >= 0.5).cast("int")
    return (
        canon.select("lang", "source", good.alias("good_quality"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_canonical"),
            F.sum("good_quality").alias("n_clean"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# edit-distance near-dup: Levenshtein over normalized prefixes within
# a bounded candidate window (same language, doc_id within 20). The
# Spark plan materializes the window as 20 exploded offsets and
# equi-joins on (doc_id + k) — a pure hash join, linear in corpus size
# with a constant 20× amplification on one side. (A naive join keyed
# only on lang with a BETWEEN band filter would be quadratic per
# language bucket.) Prefix-capping bounds per-pair edit-distance cost.
@_q(
    "d_levenshtein_neardup",
    f"""
    WITH p AS (
      SELECT doc_id, lang, substr({_STRIP_WS}, 1, 40) AS pre
      FROM documents
    )
    SELECT a.lang AS lang, COUNT(*) AS n_pairs,
           CAST(MIN(levenshtein(a.pre, b.pre)) AS BIGINT) AS min_dist,
           CAST(SUM(CASE WHEN levenshtein(a.pre, b.pre) <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_close
    FROM p a JOIN p b
      ON a.lang = b.lang AND b.doc_id - a.doc_id BETWEEN 1 AND 20
    GROUP BY a.lang
    ORDER BY a.lang
    """,
)
def d_levenshtein_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    p = d.select(
        "doc_id",
        "lang",
        F.substring(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", ""), 1, 40
        ).alias("pre"),
    )
    # left side exploded to its 20 candidate partner ids → equi-join
    a = p.select(
        "lang",
        F.col("pre").alias("a_pre"),
        F.explode(
            F.transform(F.sequence(F.lit(1), F.lit(20)), lambda k: F.col("doc_id") + k)
        ).alias("doc_id"),
    )
    b = p.alias("b")
    dist = F.levenshtein(F.col("a_pre"), F.col("b.pre"))
    return (
        a.join(b, ["doc_id", "lang"])
        .groupBy(F.col("lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(dist).cast("bigint").alias("min_dist"),
            F.sum(F.when(dist <= 10, 1).otherwise(0)).cast("bigint").alias("n_close"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# class-balanced downsampling: every language class reduced to the
# global minority-class size by deterministic hash rank (md5 of doc_id
# — portable, seedable, reproducible; NOT rand(), which no oracle can
# replay). The standard label-rebalancing op before training-set
# assembly. Two-phase on the Spark side (round 9): the minority-class
# size is a 1-row aggregate collected and RELIT as a literal bound —
# with a literal, the per-class rank filter qualifies for the
# WindowGroupLimit Partial→Final pushdown (map-side min_n-row heaps
# per class); with a runtime column bound every class would FULL-SORT
# at 100 TB. The curriculum-thresholds collect+relit precedent.
@_q(
    "d_balanced_sample",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {md5_long_sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
      FROM documents
    ), sizes AS (
      SELECT MIN(cnt) AS min_n FROM (
        SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang)
    )
    SELECT lang, COUNT(*) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM ranked, sizes
    WHERE rk <= min_n
    GROUP BY lang ORDER BY lang
    """,
)
def d_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            md5_long(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    ranked = d.select("doc_id", "lang", rk.alias("rk"))
    min_n = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("min_n"))
        .collect()[0]["min_n"]
    )
    return (
        ranked.filter(F.col("rk") <= F.lit(min_n))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# context-window chunking: split each document's token stream into
# overlapping windows (64 tokens, stride 48) — the LLM-training
# sequence-packing primitive. Window starts are generated JVM-side
# (sequence + explode); each output row is one training chunk with its
# exact token span. Linear fan-out = ceil(n_tok/stride) per doc, no
# shuffle at all until the final order (which a real pipeline writes
# unsorted).
@_q(
    "d_context_windows",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents WHERE doc_id % 20 = 0
    ), wins AS (
      SELECT doc_id, len(tk) AS n_tok,
             unnest(range(1, GREATEST(len(tk) - 1, 1) + 1, 48)) AS s, tk
      FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) / 48 + 1 AS BIGINT) AS win_idx,
           CAST(LEAST(64, n_tok - s + 1) AS BIGINT) AS n_win_tokens,
           substr(array_to_string(tk[s:s+63], ' '), 1, 30) AS win_prefix
    FROM wins
    ORDER BY doc_id, win_idx
    """,
)
def d_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 20 == 0))
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("tk")
    ).withColumn("n_tok", F.size("tk"))
    # stride-48 start positions, 1-based; last (possibly partial) window
    # starts at the largest s ≤ n_tok with s ≡ 1 (mod 48)
    wins = toks.select(
        "doc_id",
        "n_tok",
        "tk",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.col("n_tok") - 1, F.lit(1)), F.lit(48))
        ).alias("s"),
    )
    return (
        wins.select(
            "doc_id",
            (((F.col("s") - 1) / 48).cast("bigint") + 1).alias("win_idx"),
            F.least(F.lit(64), F.col("n_tok") - F.col("s") + 1)
            .cast("bigint")
            .alias("n_win_tokens"),
            F.substring(
                F.array_join(F.slice(F.col("tk"), F.col("s"), 64), " "), 1, 30
            ).alias("win_prefix"),
        )
        .orderBy("doc_id", "win_idx")
    )


# --------------------------------------------------------------------------
# benchmark decontamination: flag training documents sharing word
# 3-gram shingles with a held-out "benchmark" set (doc_id % 97 = 0
# stands in for the eval suite). The eval shingle set is DISTINCT and
# small → broadcast semi-joinable; per-train-doc contamination = hit
# fraction over its own shingles. This is the n-gram-overlap decontam
# pass every serious pretraining pipeline runs (cf. GPT-3 App. C /
# Gopher §A.3 methodology, public papers).
@_q(
    "d_decontamination",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, {_SHINGLE} AS s
      FROM (SELECT doc_id, tk, unnest(range(1, GREATEST(len(tk) - 2, 1) + 1)) AS i FROM toks)
    ), eval_sh AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
    ), train AS (
      SELECT doc_id, COUNT(*) AS n_sh,
             SUM(CASE WHEN s IN (SELECT s FROM eval_sh) THEN 1 ELSE 0 END) AS n_hit
      FROM sh WHERE doc_id % 97 <> 0
      GROUP BY doc_id
    )
    SELECT CAST(FLOOR(n_hit * 10.0 / n_sh) AS BIGINT) AS contam_decile,
           COUNT(*) AS n_docs,
           CAST(SUM(n_hit) AS BIGINT) AS total_hits
    FROM train GROUP BY 1 ORDER BY 1
    """,
)
def d_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    sh = d.select(
        "doc_id",
        F.explode(word_shingles(F.lower(F.trim(F.col("text"))), 3)).alias("s"),
    )
    eval_sh = sh.filter(F.col("doc_id") % 97 == 0).select("s").distinct()
    train_sh = sh.filter(F.col("doc_id") % 97 != 0)
    hits = (
        train_sh.join(
            F.broadcast(eval_sh.withColumn("hit", F.lit(1))), "s", "left_outer"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return (
        hits.groupBy(
            F.floor(F.col("n_hit") * 10.0 / F.col("n_sh")).cast("bigint").alias("contam_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_hit").cast("bigint").alias("total_hits"),
        )
        .orderBy("contam_decile")
    )


# --------------------------------------------------------------------------
# PII scrubbing: regex redaction of email/phone patterns with
# per-source redaction accounting. The synthetic corpus carries no
# PII, so the pipeline plants a deterministic contact line per doc
# (same expression in both engines) and then scrubs it — what's being
# verified is the redaction regex machinery and the audit counts, on
# the engine's own text columns. regexp_replace is JVM-side codegen;
# at scale this is a pure map stage (zero shuffles before the audit
# agg).
@_q(
    "d_pii_scrub",
    r"""
    WITH planted AS (
      SELECT doc_id, source,
             concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                    '@example.com or +1-555-', CAST(1000 + doc_id % 9000 AS VARCHAR))
               AS raw
      FROM documents
    ), scrubbed AS (
      SELECT doc_id, source, raw,
             regexp_replace(
               regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
               '\+?[0-9]+-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
      FROM planted
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN clean LIKE '%<EMAIL>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_email_redacted,
           CAST(SUM(CASE WHEN clean LIKE '%<PHONE>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_phone_redacted,
           CAST(SUM(length(raw) - length(clean)) AS BIGINT) AS chars_removed
    FROM scrubbed GROUP BY source ORDER BY source
    """,
)
def d_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    planted = d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("raw"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("raw"), r"[a-z0-9._]+@[a-z0-9.-]+", "<EMAIL>"),
        r"\+?[0-9]+-[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    )
    scrubbed = planted.withColumn("clean", clean)
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("clean").like("%<EMAIL>%"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_email_redacted"),
            F.sum(F.when(F.col("clean").like("%<PHONE>%"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_phone_redacted"),
            F.sum(F.length("raw") - F.length("clean")).cast("bigint").alias("chars_removed"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# embedding-based semantic near-dup over documents — the cross-modal
# dedup path: documents ⋈ embeddings (doc_id = vec_id), then LSH-bucket
# blocking WITHIN language (pairs are only scored when both docs share
# the language AND the 8-bit hyperplane signature — the blocking join
# is an equi-join on (lang, bucket), never all-pairs), then an
# integer-exact cosine-threshold test on fixed-point codes. The 0.3
# threshold is calibrated to this synthetic corpus (max candidate
# cosine ≈ 0.48); at 100 TB the same plan holds with the bucket id as
# partition key and a near-1.0 threshold. Ints-only output.
def _semantic_pairs_cte(src: str = "documents") -> str:
    """Shared WITH-chain: embedded docs → (lang, LSH-bucket) blocked
    candidate pairs → integer-cosine similarity verdicts (`s` carries
    both pair endpoints so consumers can aggregate OR build keep
    lists). ``src`` (must expose doc_id, lang) restricts the doc set —
    the HTML-fed funnel dedups only the EXTRACTED corpus (production
    stage order: extraction before dedup)."""
    from ..functions.similarity import lsh_planes
    from ..plans.vecpipe import _lsh_sql_bucket

    code = "list_transform(e.embedding::DOUBLE[], x -> CAST(FLOOR(x * 1000.0) AS BIGINT))"
    return f"""
    WITH j AS (
      SELECT d.doc_id, d.lang, {code} AS c
      FROM {src} d JOIN embeddings e ON d.doc_id = e.vec_id
    ), b AS (
      SELECT doc_id, lang, c, {_lsh_sql_bucket('c', lsh_planes())} AS bk FROM j
    ), p AS (
      SELECT a.lang, a.doc_id AS da, b2.doc_id AS db,
             CAST(list_dot_product(a.c, b2.c) AS BIGINT) AS num,
             CAST(list_dot_product(a.c, a.c) AS BIGINT) AS na,
             CAST(list_dot_product(b2.c, b2.c) AS BIGINT) AS nb
      FROM b a JOIN b b2
        ON a.lang = b2.lang AND a.bk = b2.bk AND a.doc_id < b2.doc_id
    ), s AS (
      SELECT lang, da, db,
             CASE WHEN num > 0 AND CAST(num AS DOUBLE) * CAST(num AS DOUBLE) >
                       (0.09 * CAST(na AS DOUBLE)) * CAST(nb AS DOUBLE)
                  THEN 1 ELSE 0 END AS sim
      FROM p
    )"""


def _semantic_oracle() -> str:
    return f"""{_semantic_pairs_cte()}
    SELECT lang, COUNT(*) AS n_candidates, CAST(SUM(sim) AS BIGINT) AS n_similar
    FROM s GROUP BY lang ORDER BY lang
    """


def _semantic_pairs(
    spark: SparkSession,
    sf_dir: str,
    persist: bool = True,
    docs: DataFrame | None = None,
    planes: list | None = None,
):
    """Spark twin of `_semantic_pairs_cte`: returns (``b`` embedded docs
    with bucket ids, ``s`` blocked-pair similarity verdicts, ``caches``
    the caller must release after materializing — the CALLER_RELEASED
    contract). ``docs`` (doc_id, lang) overrides the document set —
    the `src` seam of the oracle twin. ``planes`` overrides the
    hyperplane set (production = lsh_planes() with LSH_BITS): the
    plane-scaling remedy SCALE.md prescribes for corpus growth is
    measured through this seam (tools/scale40_probe.py) — each added
    plane halves expected bucket occupancy, so planes ∝ log(corpus)
    keeps per-bucket pair mass constant."""
    from ..functions.similarity import int_code, lsh_bucket, lsh_planes
    from ..functions.vectors import to_double

    if planes is None:
        planes = lsh_planes()
    t = load_tables(spark, sf_dir)
    if docs is None:
        docs = t["documents"].select("doc_id", "lang")
    j = (
        docs.select("doc_id", "lang")
        .join(t["embeddings"], F.col("doc_id") == F.col("vec_id"))
        .select("doc_id", "lang", int_code(to_double(F.col("embedding"))).alias("c"))
    )
    idot = lambda x, y: F.aggregate(
        F.zip_with(x, y, lambda u, v: u * v), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    # self-norms once per DOCUMENT before the join — inside the pair
    # select they would re-run the O(dim) interpreted HOF per pair
    # (B× redundant work for a B-pair bucket)
    b = j.withColumn("bk", lsh_bucket(F.col("c"), planes)).withColumn(
        "nn", idot(F.col("c"), F.col("c"))
    )
    # b feeds BOTH sides of the pair self-join and (for the keep-list
    # consumers) the left side of the verdict join — without the cache
    # the docs⋈embeddings scan plus the O(dim) interpreted
    # int_code/lsh_bucket/self-norm HOFs execute once per consumer
    # (the multi-consumer rule the SemDeDup emb cache follows)
    if persist:
        b = b.persist()
    a, b2 = b.alias("a"), b.alias("b2")
    p = a.join(
        b2,
        (F.col("a.lang") == F.col("b2.lang"))
        & (F.col("a.bk") == F.col("b2.bk"))
        & (F.col("a.doc_id") < F.col("b2.doc_id")),
    ).select(
        F.col("a.lang").alias("lang"),
        F.col("a.doc_id").alias("da"),
        F.col("b2.doc_id").alias("db"),
        idot(F.col("a.c"), F.col("b2.c")).alias("num"),
        F.col("a.nn").alias("na"),
        F.col("b2.nn").alias("nb"),
    )
    s = p.select(
        "lang",
        "da",
        "db",
        F.when(
            (F.col("num") > 0)
            & (
                F.col("num").cast("double") * F.col("num").cast("double")
                > (F.lit(0.09) * F.col("na").cast("double")) * F.col("nb").cast("double")
            ),
            1,
        )
        .otherwise(0)
        .alias("sim"),
    )
    return b, s, ([b] if persist else [])


def _semantic_keep_lazy(
    spark: SparkSession, sf_dir: str, persist: bool = True, docs: DataFrame | None = None
):
    """The LSH-blocked keep-list, shared by v_semantic_keep and the
    linear refinery funnel so the two faces cannot drift: per embedded
    doc (doc_id, lang, bucket, keep), keep-lowest-id within similar
    blocked pairs. Returns (keep, caches). ``docs`` restricts the doc
    set (the HTML-fed funnel passes the extracted corpus)."""
    b, s, caches = _semantic_pairs(spark, sf_dir, persist=persist, docs=docs)
    rm = s.filter(F.col("sim") == 1).select("db").distinct()
    keep = b.join(rm, b["doc_id"] == rm["db"], "left").select(
        b["doc_id"],
        b["lang"],
        b["bk"].alias("bucket"),
        F.when(rm["db"].isNull(), 1).otherwise(0).alias("keep"),
    )
    return keep, caches


# the keepv CTE body both oracles share (same no-drift rule as the
# Spark-side helper above)
_SEMANTIC_KEEP_CTE_BODY = """
      SELECT b.doc_id, b.lang, b.bk AS bucket,
             CASE WHEN rm.db IS NULL THEN 1 ELSE 0 END AS keep
      FROM b LEFT JOIN (SELECT DISTINCT db FROM s WHERE sim = 1) rm
        ON rm.db = b.doc_id"""


@_q("d_semantic_neardup", _semantic_oracle())
def d_semantic_neardup(spark: SparkSession, sf_dir: str, persist: bool = True) -> DataFrame:
    b, s, caches = _semantic_pairs(spark, sf_dir, persist=persist)
    out = (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum("sim").alias("n_similar"),
        )
        .orderBy("lang")
    )
    return checkpoint_release(out, caches) if persist else out


ALL_SPECS["d_semantic_neardup"].lazy_plan = (
    lambda spark, sf_dir: d_semantic_neardup(spark, sf_dir, persist=False)
)


# The consumable, LINEAR face of semantic dedup (the stage a 100 TB
# refinery actually runs — see SCALE.md "Round-7 refinery profile":
# exact Lloyd SemDeDup is quadratic in either assignment or pair mass,
# while this LSH-bucket-blocked form's candidate generation is an
# equi-join on (lang, bucket), measured 1.3× at 10× data): per embedded
# doc, keep = 1 unless it is the HIGHER-id side of a similar blocked
# pair — identical keep-lowest-id semantics to v_semdedup_keep, LSH
# blocking instead of Lloyd clusters.
@_q(
    "v_semantic_keep",
    f"""{_semantic_pairs_cte()}, keepv AS ({_SEMANTIC_KEEP_CTE_BODY}
    )
    SELECT doc_id, lang, bucket, keep FROM keepv ORDER BY doc_id
    """,
    doc="LSH-blocked semantic-dedup keep-list: per embedded doc "
    "(lang, bucket, keep) with keep-lowest-id within similar blocked "
    "pairs — the linear production stage the corpus refinery swaps in "
    "for the quadratic exact-Lloyd SemDeDup at scale",
)
def v_semantic_keep(spark: SparkSession, sf_dir: str, persist: bool = True) -> DataFrame:
    keep, caches = _semantic_keep_lazy(spark, sf_dir, persist=persist)
    out = keep.orderBy("doc_id")
    return checkpoint_release(out, caches) if persist else out


ALL_SPECS["v_semantic_keep"].lazy_plan = (
    lambda spark, sf_dir: v_semantic_keep(spark, sf_dir, persist=False)
)


# --------------------------------------------------------------------------
# Sequence packing — the step after context-windowing in a training-data
# pipeline: fill fixed token-budget bins (here 1024) with documents so
# batch slots aren't wasted on padding. Sequential-fill packing per
# SOURCE partition: running token total in doc_id order → bin id =
# floor((cumsum - n_tok) / budget). The window partitions by source, so
# at 100 TB each source packs independently (parallel, one shuffle on
# source) instead of a global single-partition cumsum; within a source
# the order is the deterministic doc_id. All-integer output.
@_q(
    "d_sequence_packing",
    f"""
    WITH toks AS (
      SELECT doc_id, source, len({_TOKS}) AS n_tok FROM documents
    ), packed AS (
      SELECT source, doc_id, n_tok,
             CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok) / 1024.0) AS BIGINT) AS bin
      FROM toks
    )
    SELECT source, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
           CAST(FLOOR(SUM(n_tok) * 1000000.0 / 1024.0) AS BIGINT) AS fill_micro
    FROM packed
    GROUP BY source, bin
    ORDER BY source, bin
    LIMIT 40
    """,
)
def d_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin", F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(1024.0))
    )
    return (
        packed.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.floor(F.sum("n_tok") * F.lit(1000000.0) / F.lit(1024.0)).alias("fill_micro"),
        )
        .orderBy("source", "bin")
        .limit(40)
    )


# --------------------------------------------------------------------------
# Repetition filter — the Gopher/C4-style quality gate this family was
# missing: fraction of duplicated word 3-grams within each document
# (boilerplate and degenerate repetition score high). Per-doc the
# signal is (total − distinct) 3-grams — one explode + one two-level
# agg, all partition-local until the per-doc groupBy; the flag uses
# integer cross-multiplication (dup·5 > total ⇔ dup_frac > 0.2), so
# the whole result is integer-exact. Per-language summary output.
@_q(
    "d_repetition_filter",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, {_TOKS} AS tk FROM documents
    ), grams AS (
      SELECT doc_id, lang, {_SHINGLE} AS g
      FROM (SELECT doc_id, lang, tk,
                   unnest(range(1, GREATEST(len(tk) - 2, 0) + 1)) AS i
            FROM toks)
    ), per_doc AS (
      SELECT doc_id, lang,
             COUNT(*) AS n_grams,
             COUNT(DISTINCT g) AS n_distinct,
             COUNT(*) - COUNT(DISTINCT g) AS n_dup
      FROM grams GROUP BY doc_id, lang
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_dup * 5 > n_grams THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(n_dup) AS BIGINT) AS total_dup_grams,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def d_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    # RAW (non-distinct) 3-grams — functions.hashing.word_shingles dedupes
    # by design for minhash, which would erase the very signal measured
    # here; docs with <3 tokens produce no grams (empty sequence).
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    raw_grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(2)),
            lambda i: F.array_join(F.slice(toks, i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("doc_id", "lang", F.explode(raw_grams).alias("g"))
    per_doc = grams.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("g").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("g")).alias("n_dup"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_dup") * 5 > F.col("n_grams")).cast("bigint")).alias("n_flagged"),
            F.sum("n_dup").alias("total_dup_grams"),
            F.sum("n_grams").alias("total_grams"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Corpus-statistics fluency score — a bigram-LM-shaped quality signal
# with no float log-probs: build the corpus bigram vocabulary (bigrams
# seen in ≥2 documents) in pass 1, then score each document by its
# fraction of out-of-vocabulary bigrams in pass 2. Degenerate or
# machine-garbled text has a high OOV fraction against its own corpus.
# The vocabulary is a self-derived dim joined back to the exploded
# bigram stream (left anti = OOV) — the two-pass shape a real n-gram LM
# scorer has, with the counts staying integer-exact end to end. At
# 100 TB the vocab is itself fact-scale, so the join is a key-partitioned
# shuffle join (NOT broadcast) — exactly how it's written here.
@_q(
    "d_oov_bigram_score",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, {_TOKS} AS tk FROM documents
    ), bigrams AS (
      SELECT doc_id, lang, concat_ws(' ', tk[i], tk[i+1]) AS bg
      FROM (SELECT doc_id, lang, tk,
                   unnest(range(1, GREATEST(len(tk) - 1, 0) + 1)) AS i
            FROM toks)
    ), vocab AS (
      SELECT bg FROM (
        SELECT bg, COUNT(DISTINCT doc_id) AS df FROM bigrams GROUP BY bg
      ) WHERE df >= 2
    ), scored AS (
      SELECT b.doc_id, b.lang,
             COUNT(*) AS n_bigrams,
             SUM(CASE WHEN v.bg IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM bigrams b LEFT JOIN vocab v ON b.bg = v.bg
      GROUP BY b.doc_id, b.lang
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_oov) AS BIGINT) AS total_oov,
           CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
           CAST(SUM(CASE WHEN n_oov * 2 > n_bigrams THEN 1 ELSE 0 END) AS BIGINT) AS n_disfluent
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def d_oov_bigram_score(spark: SparkSession, sf_dir: str, persist: bool = True) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    raw_bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # persist: the exploded bigram stream feeds BOTH the vocab agg and
    # the scoring join — without it the full tokenize/explode lineage
    # runs twice (two corpus scans at 100 TB).
    bigrams = d.select("doc_id", "lang", F.explode(raw_bigrams).alias("bg"))
    if persist:
        bigrams = bigrams.persist()
    vocab = (
        bigrams.groupBy("bg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("bg")
    )
    scored = (
        bigrams.join(vocab.withColumn("in_vocab", F.lit(1)), "bg", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("in_vocab").isNull().cast("bigint")).alias("n_oov"),
        )
    )
    out = (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_oov").alias("total_oov"),
            F.sum("n_bigrams").alias("total_bigrams"),
            F.sum((F.col("n_oov") * 2 > F.col("n_bigrams")).cast("bigint")).alias("n_disfluent"),
        )
        .orderBy("lang")
    )
    if not persist:
        return out
    return checkpoint_release(out, [bigrams])


ALL_SPECS["d_oov_bigram_score"].lazy_plan = (
    lambda spark, sf_dir: d_oov_bigram_score(spark, sf_dir, persist=False)
)


# plan_audit inspects the lazy pipeline (the registered callable
# checkpoints eagerly); persist=False so the audit never registers a
# cache it cannot release
ALL_SPECS["d_dedup_clusters"].lazy_plan = (
    lambda spark, sf_dir: _dedup_clusters_lazy(spark, sf_dir, persist=False)[0]
)
ALL_SPECS["t_dedup_clusters_lane2"].lazy_plan = (
    lambda spark, sf_dir: _dedup_clusters_lazy(
        spark, sf_dir, persist=False, two_lane=True
    )[0]
)


# --------------------------------------------------------------------------
# SoftDedup — keep EVERY document but down-weight near-duplicates:
# per-doc training weight 1/|near-dup cluster| (singletons weigh 1.0),
# so a 40-copy boilerplate family contributes one document's worth of
# gradient instead of 40 while rare text keeps full weight. The modern
# alternative to hard dedup when the duplicated text is still useful
# signal. Reuses the _jaccard_edge_pairs → connected-components chain
# (identical edge semantics to d_dedup_clusters, so the same
# recursive-CTE oracle verifies the clustering) and left-joins the
# cluster sizes back onto the corpus — docs with no near-dup edge never
# enter the CC relation and coalesce to size 1. Scale shape: the edge
# build is the LSH-capped self-join (never all-pairs), CC is
# edge-count-scaled, and the final join is corpus ⋈ cluster-table on
# doc_id (AQE broadcasts the cluster side while it is small, shuffles
# at 100 TB). Output is the consumable per-doc weight table a trainer
# ingests directly.
def _soft_dedup_lazy(spark: SparkSession, sf_dir: str, persist: bool = True):
    from ..operators.components import connected_components

    d = _fanout(load_tables(spark, sf_dir)["documents"])
    pairs, caches = _jaccard_edge_pairs(d, persist=persist)
    comp = connected_components(pairs, "da", "db")
    csize = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    docw = (
        d.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .join(csize, "component", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("sz"), F.lit(1)).cast("bigint").alias("cluster_size"),
        )
    )
    out = docw.select(
        "doc_id",
        "cluster_size",
        trunc6(F.lit(1.0) / F.col("cluster_size")).alias("weight"),
    ).orderBy("doc_id")
    return out, caches


@_q(
    "d_soft_dedup_weights",
    CC_ORACLE_CTE
    + """, csize AS (
      SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
    )
    SELECT d.doc_id,
           CAST(COALESCE(cs.sz, 1) AS BIGINT) AS cluster_size,
           FLOOR((1.0 / COALESCE(cs.sz, 1)) * 1000000.0) / 1000000.0 AS weight
    FROM documents d
    LEFT JOIN comp c ON c.node = d.doc_id
    LEFT JOIN csize cs ON cs.component = c.component
    ORDER BY d.doc_id
    """,
    doc="SoftDedup: per-doc training weight 1/|near-dup cluster| from "
    "the MinHash-threshold connected components (singletons weigh 1.0) "
    "— down-weight duplicates instead of dropping them; the consumable "
    "weight table a trainer joins on doc_id",
)
def d_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, caches = _soft_dedup_lazy(spark, sf_dir)
    out = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


ALL_SPECS["d_soft_dedup_weights"].lazy_plan = (
    lambda spark, sf_dir: _soft_dedup_lazy(spark, sf_dir, persist=False)[0]
)
