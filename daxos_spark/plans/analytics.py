"""Product-analytics query family: ordered funnels, cohort retention,
and market-basket co-occurrence.

Beyond-parity coverage (the reference has no event analytics; SURVEY
§2.5 notes the absence of window/sessionization semantics). These are
the standard large-scale clickstream shapes: each is ONE shuffle on its
natural key with map-side partial aggregation, no self-join fan-out
beyond per-group bounds.

Determinism: outputs are counts/integers only — identical across
engines with no float policy needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from .registry import QuerySpec, register


def _q(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn):
        register(QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags))
        return fn

    return deco


# --------------------------------------------------------------------------
# ordered funnel view → click → purchase. The min-timestamp funnel:
# one conditional-min aggregation per user (single shuffle on user_id,
# partials map-side), then a driver-sized conditional count. NULL
# stage timestamps propagate through the comparison to "not converted"
# identically in both engines.
@_q(
    "q_funnel_conversion",
    """
    WITH m AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(t_view) AS n_view,
           SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS n_view_then_click,
           SUM(CASE WHEN t_click > t_view AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS n_full_funnel
    FROM m
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    m = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    stage2 = F.col("t_click") > F.col("t_view")
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    return m.agg(
        F.count("t_view").alias("n_view"),
        F.sum(F.when(stage2, 1).otherwise(0)).alias("n_view_then_click"),
        F.sum(F.when(stage3, 1).otherwise(0)).alias("n_full_funnel"),
    )


# --------------------------------------------------------------------------
# weekly cohort retention: users bucketed by first-event week, counted
# per (cohort_week, week_offset). Two shuffles total — the first-event
# agg on user_id and the cohort/offset count — both keyed small.
# Weeks are integer day-arithmetic from a fixed epoch date (NOT
# date_trunc('week'), whose week-start convention is engine-dependent).
@_q(
    "q_weekly_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id,
             CAST(FLOOR(DATE_DIFF('day', DATE '2024-01-01', CAST(MIN(ts) AS DATE)) / 7)
                  AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           CAST(FLOOR(DATE_DIFF('day', DATE '2024-01-01', CAST(e.ts AS DATE)) / 7)
                AS BIGINT) - cohort_week AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
)
def q_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    week = lambda c: F.floor(F.datediff(F.to_date(c), F.lit("2024-01-01")) / 7).cast("bigint")  # noqa: E731
    firsts = e.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    return (
        # no broadcast hint: firsts is per-user (grows with the data) —
        # the sort-merge/shuffled-hash join co-partitions on user_id and
        # reuses that partitioning; AQE may still broadcast when small
        e.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# market-basket co-occurrence: part pairs appearing in the same order.
# DISTINCT (order, part) first so the pair fan-out is bounded by order
# width (~items/order choose 2), then a per-order self-join — the
# standard co-occurrence plan whose cost is Σ w² over orders, NOT a
# cross join. At 100 TB the distinct + join co-partition on l_orderkey
# (one shuffle, AQE handles skewed mega-orders).
@_q(
    "q_part_cooccurrence",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_orders
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY pa, pb
    HAVING COUNT(*) >= 2
    ORDER BY n_orders DESC, pa, pb
    LIMIT 25
    """,
)
def q_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-shuffle formulation: collect_set dedups parts within each
    # order (replacing the DISTINCT exchange), then i<j pairs are
    # expanded JVM-side with array HOFs (sorted array → slice beyond i)
    # — no self-join. The oracle SQL's distinct+self-join is the same
    # relation; this plan just fuses dedup and pairing into the one
    # groupBy(l_orderkey) shuffle. Pair fan-out stays bounded by order
    # width exactly as the join version.
    li = load_tables(spark, sf_dir)["lineitem"]
    parts = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    return (
        parts.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "pa", "pb")
        .limit(25)
    )
