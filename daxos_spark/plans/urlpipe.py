"""URL-pipeline queries: canonicalization + URL-level dedup — the
stage every crawl pipeline runs BEFORE content dedup (CCNet /
RefinedWeb order; VERDICT-r10 ask #2).

Beyond-parity (the reference processes no URLs). The harness registers
no URL table, so the snapshot corpus is SYNTHESIZED deterministically
from ``documents`` inside the query — in BOTH engines, from one shared
variant template — and then canonicalized (functions/url.py). Each
document becomes one fetch snapshot of article ``doc_id % 211`` on host
``article % 7``, rendered through one of FIVE URL variant classes
(www + mixed case, upper-cased authority, default port + utm params,
trailing slash, tracking param + fragment) chosen by ``doc_id % 5`` —
so the ground truth is exact arithmetic: every article with k
snapshots is a k-fold URL-level duplicate family that raw URL equality
must miss (five variant spellings) and canonical equality must find.

Scale shape: synthesis + canonicalization are per-row JVM regex
expressions (zero shuffle); dedup is ONE groupBy on the canonical key
(max_by latest-snapshot pick — the latest_by_key shape); the censuses
are single conditional aggregates. At 100 TB the canonical key is the
natural partition key of the crawl store, and this dedup is the
cheapest stage in the pipeline — which is WHY it runs first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.url import (
    sql_url_canonical,
    url_canonical_sqlexpr,
    url_rule_steps_spark,
    url_rule_steps_sql,
)
from .docpipe import _fanout
from .registry import QuerySpec, register, sql_trunc6, trunc6

ALL = {}


def _q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        register(QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=("url",)))
        return fn

    return deco


_N_ART = 211  # articles (prime → uneven snapshot families at any SF)
_N_HOST = 7
_TS0 = 1_700_000_000

# (prefix, suffix) per variant class — the URL is
#   prefix || host_index || infix || article_id || suffix
_VARIANTS = (
    ("https://www.example", ".com/articles/", ""),
    ("HTTPS://EXAMPLE", ".COM/articles/", ""),
    ("https://example", ".com:443/articles/", "?utm_source=feed&utm_medium=rss"),
    ("https://example", ".com/articles/", "/"),
    ("https://example", ".com/articles/", "?ref=home#sec-2"),
)


def _snap_sql() -> str:
    """duckdb CTE body: snaps(doc_id, ts, url)."""
    arms = " ".join(
        f"WHEN {i} THEN '{p}' || CAST((doc_id % {_N_ART}) % {_N_HOST} AS VARCHAR)"
        f" || '{m}' || CAST(doc_id % {_N_ART} AS VARCHAR) || '{s}'"
        for i, (p, m, s) in enumerate(_VARIANTS)
    )
    return f"""snaps AS (
      SELECT doc_id, {_TS0} + doc_id AS ts,
             CASE doc_id % {len(_VARIANTS)} {arms} END AS url
      FROM documents
    )"""


def _snap_spark_url() -> str:
    arms = " ".join(
        f"WHEN {i} THEN '{p}' || CAST((doc_id % {_N_ART}) % {_N_HOST} AS STRING)"
        f" || '{m}' || CAST(doc_id % {_N_ART} AS STRING) || '{s}'"
        for i, (p, m, s) in enumerate(_VARIANTS)
    )
    return f"CASE doc_id % {len(_VARIANTS)} {arms} END"


def _snaps_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _fanout(load_tables(spark, sf_dir)["documents"])
    return d.select(
        "doc_id",
        (F.lit(_TS0) + F.col("doc_id")).alias("ts"),
        F.expr(_snap_spark_url()).alias("url"),
    )


# --------------------------------------------------------------------------
# Rule-fire census: which canonicalization rules actually change URLs,
# and how the distinct-URL count collapses after each rule — the audit
# that justifies each rule's existence on a corpus (a rule that never
# fires is dead weight in the scan). Cumulative per-rule application,
# one conditional-aggregate pass.
def _url_canonical_oracle() -> str:
    steps = url_rule_steps_sql("url")
    cols = ", ".join(f"{expr} AS r{i + 1}" for i, (_, expr) in enumerate(steps))
    branches = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS step, '{rule}' AS rule, "
        f"CAST(SUM(CASE WHEN r{i + 1} <> r{i} THEN 1 ELSE 0 END) AS BIGINT) AS n_changed, "
        f"CAST(COUNT(DISTINCT r{i + 1}) AS BIGINT) AS distinct_after FROM r"
        for i, (rule, _) in enumerate(steps)
    )
    return f"""
    WITH {_snap_sql()}, r AS (
      SELECT url AS r0, {cols} FROM snaps
    )
    SELECT * FROM ({branches}) ORDER BY step
    """


@_q(
    "t_url_canonical",
    _url_canonical_oracle(),
    doc="URL canonicalization rule-fire census: the four rule families "
    "(fragment strip, authority lowercase+www+default-port, tracking-"
    "param removal, trailing slash) applied cumulatively — per rule, "
    "how many snapshot URLs it changed and the distinct-URL count "
    "after it; the audit that shows each rule earning its place in "
    "the scan (and the collapse trajectory toward the canonical key)",
)
def t_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    snaps = _snaps_df(spark, sf_dir)
    steps = url_rule_steps_spark("url")
    r = snaps.select(
        F.col("url").alias("r0"),
        *[F.expr(expr).alias(f"r{i + 1}") for i, (_, expr) in enumerate(steps)],
    )
    aggs = []
    for i in range(len(steps)):
        aggs += [
            F.sum((F.col(f"r{i + 1}") != F.col(f"r{i}")).cast("int"))
            .cast("bigint")
            .alias(f"c{i + 1}"),
            F.countDistinct(f"r{i + 1}").cast("bigint").alias(f"d{i + 1}"),
        ]
    a = r.agg(*aggs)
    stack = ", ".join(
        f"CAST({i + 1} AS BIGINT), '{rule}', c{i + 1}, d{i + 1}"
        for i, (rule, _) in enumerate(steps)
    )
    return a.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step, rule, n_changed, distinct_after)"
    ).orderBy("step")


# --------------------------------------------------------------------------
# URL-level dedup: keep the LATEST snapshot per canonical URL (max_by
# on fetch time — the latest_by_key shape every crawl store runs at
# ingest). Top-20 canonical families by snapshot count.
_CANON_SQL = sql_url_canonical("url")
_CANON_SPARK = url_canonical_sqlexpr("url")


@_q(
    "t_url_dedup",
    f"""
    WITH {_snap_sql()}, c AS (
      SELECT doc_id, ts, {_CANON_SQL} AS curl FROM snaps
    )
    SELECT curl,
           CAST(COUNT(*) AS BIGINT) AS n_snapshots,
           CAST(MIN(ts) AS BIGINT) AS first_ts,
           CAST(MAX(ts) AS BIGINT) AS last_ts,
           CAST(MAX_BY(doc_id, ts) AS BIGINT) AS kept_doc_id
    FROM c GROUP BY curl
    ORDER BY n_snapshots DESC, curl LIMIT 20
    """,
    doc="URL-level dedup (keep latest snapshot per canonical URL): "
    "snapshots canonicalized per-row, ONE groupBy on the canonical key, "
    "max_by(doc_id, ts) latest-snapshot pick (fetch times are unique by "
    "construction) — top-20 canonical families by snapshot count; the "
    "cheapest dedup stage in the pipeline, which is why crawl stores "
    "run it before any content fingerprinting",
)
def t_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _snaps_df(spark, sf_dir).select(
        "doc_id", "ts", F.expr(_CANON_SPARK).alias("curl")
    )
    return (
        c.groupBy("curl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_snapshots"),
            F.min("ts").cast("bigint").alias("first_ts"),
            F.max("ts").cast("bigint").alias("last_ts"),
            F.expr("max_by(doc_id, ts)").cast("bigint").alias("kept_doc_id"),
        )
        .orderBy(F.col("n_snapshots").desc(), "curl")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Canonicalization→dedup synergy, quantified (the t_html_dedup_recovery
# convention): raw URL equality finds only same-variant refetches;
# canonical equality recovers the full cross-variant families. The
# measured justification for canonicalizing before URL dedup.
@_q(
    "t_url_dedup_recovery",
    f"""
    WITH {_snap_sql()}, c AS (
      SELECT url, {_CANON_SQL} AS curl FROM snaps
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_snapshots,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS raw_unique,
           CAST(COUNT(DISTINCT curl) AS BIGINT) AS canonical_unique,
           CAST(COUNT(*) - COUNT(DISTINCT url) AS BIGINT) AS dups_found_raw,
           CAST(COUNT(*) - COUNT(DISTINCT curl) AS BIGINT) AS dups_found_canonical,
           CAST(COUNT(DISTINCT url) - COUNT(DISTINCT curl) AS BIGINT) AS recovered,
           {sql_trunc6('CAST(COUNT(DISTINCT url) - COUNT(DISTINCT curl) AS DOUBLE) / COUNT(*)')} AS recovery_rate
    FROM c
    """,
    doc="canonicalization->dedup synergy census: raw URL equality vs "
    "canonical equality on the synthesized snapshot corpus — distinct "
    "counts, duplicate families found by each, and the recovery the "
    "canonical key adds; the measured reason URL canonicalization runs "
    "before URL dedup",
)
def t_url_dedup_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _snaps_df(spark, sf_dir).select(
        "url", F.expr(_CANON_SPARK).alias("curl")
    )
    n = F.count(F.lit(1))
    ru, cu = F.countDistinct("url"), F.countDistinct("curl")
    return c.agg(
        n.cast("bigint").alias("n_snapshots"),
        ru.cast("bigint").alias("raw_unique"),
        cu.cast("bigint").alias("canonical_unique"),
        (n - ru).cast("bigint").alias("dups_found_raw"),
        (n - cu).cast("bigint").alias("dups_found_canonical"),
        (ru - cu).cast("bigint").alias("recovered"),
        trunc6((ru - cu).cast("double") / n).alias("recovery_rate"),
    )
