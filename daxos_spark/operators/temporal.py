"""Temporal join operators: as-of join via union+window.

The reference has no temporal joins (SURVEY.md §2.3: "none is theta,
range, as-of, or interval"); this is beyond-parity surface for
event/time-series data.

Algorithm (the standard at-scale as-of): instead of joining (which
fans out L×R per key and needs a per-pair argmax), UNION the two sides
with a tag, sort within each key partition by (ts, tag), and carry the
most recent right-side row forward with last(..., ignorenulls) over
rows-unbounded-preceding. One shuffle on the key, linear work, no
fan-out — robust at 100 TB since each key group streams through a
single window sort; skewed keys can be pre-salted by coarse time bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``) and the same key.

    Returns all left columns plus every non-key right column renamed
    with ``suffix`` (nulls when no prior right row exists — LEFT ASOF
    semantics). Left payload columns ride through the union, so the
    whole operator is one shuffle on ``on`` and zero joins.
    """
    r_cols = [c for c in right.columns if c != on and c != right_ts]
    l_cols = [c for c in left.columns if c != on and c != left_ts]

    # equi-join semantics: a null key matches nothing. Without this
    # filter the window partition would group all null keys together
    # and attach null-keyed right rows to null-keyed left rows.
    right = right.filter(F.col(on).isNotNull())

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c).alias(f"__r_{c}") for c in r_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    lf = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in r_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    # At equal timestamps a right row must sort BEFORE the left row to be
    # visible (<= semantics) or AFTER it to be invisible (strict <).
    tag_order = F.col("__is_right").desc() if not strict else F.col("__is_right").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lf.unionByName(r).select(
        "*",
        *[F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__c_{c}") for c in r_cols],
        F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias("__c_ts"),
    )
    return u.filter(F.col("__is_right") == 0).select(
        F.col(on),
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in l_cols],
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in r_cols],
        F.col("__c_ts").alias(f"{right_ts}{suffix}"),
    )


def latest_by_key(
    df: DataFrame,
    key: str | list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Latest-wins row per key: CDC changelog compaction.

    Equivalent to ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY
    order_cols DESC) = 1`` but expressed as a partial-aggregable
    ``max(struct(order_cols..., payload...))`` — map-side combine keeps
    the shuffle at key cardinality and a hot key's history never
    concentrates in one window partition.  The order columns must make
    the ordering total (include a unique tiebreak, e.g. the change id);
    with ties the struct max still picks a deterministic row, but which
    payload wins would be engine-defined.

    Returns one row per key: key column(s) + payload columns of the
    latest change.
    """
    keys = [key] if isinstance(key, str) else list(key)
    packed = df.groupBy(*keys).agg(
        F.max(F.struct(*order_cols, *payload_cols)).alias("__last")
    )
    return packed.select(
        *keys, *[F.col(f"__last.{c}").alias(c) for c in payload_cols]
    )
