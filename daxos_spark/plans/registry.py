"""QuerySpec registry + cross-engine determinism helpers.

Determinism strategy for the value-hash correctness gate
(CORRECTNESS_r{N}.json): floating-point SUM/AVG over doubles is
order-dependent, and Spark and duckdb will not accumulate in the same
order. Every aggregate therefore goes through an exact DECIMAL sum:

    dsum(x)  = CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)

Decimal addition is associative/commutative → order-independent → both
engines produce the identical value; the final decimal→double conversion
of the same decimal is also identical. Averages divide two identical
numbers (double ÷ bigint count). Rankings order by such values plus an
integer tie-break, so sort order matches too.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- Spark side

DEC = "decimal(25,6)"


def dsum(c: Column) -> Column:
    """Order-independent sum of a double expression (exact decimal)."""
    return F.sum(c.cast(DEC)).cast("double")


def davg(c: Column) -> Column:
    """Order-independent mean: exact decimal sum / count of non-nulls."""
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def trunc6(c: Column) -> Column:
    """Cross-engine-safe 6-decimal truncation.

    ROUND(x, n) is NOT portable: Spark rounds HALF_UP on the exact
    decimal expansion while duckdb rounds the scaled double to-nearest
    (ties-to-even) — they disagree on exact-binary ratios like k/128.
    floor(x*1e6)/1e6 is identical in both engines for identical x.
    """
    return F.floor(c * F.lit(1000000.0)) / F.lit(1000000.0)


# ----------------------------------------------------------------- SQL side


def sql_trunc6(expr: str) -> str:
    return f"FLOOR(({expr}) * 1000000.0) / 1000000.0"


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"


# ------------------------------------------------------------------ registry


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


ALL_SPECS: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in ALL_SPECS:
        raise ValueError(f"duplicate query name {spec.name}")
    ALL_SPECS[spec.name] = spec
    return spec


def get_specs() -> dict[str, QuerySpec]:
    """Import all plan modules (side-effect: registration) and return."""
    from . import (  # noqa: F401
        analytics,
        blobpipe,
        diagnostics,
        docpipe,
        docpipe2,
        mlpipe,
        relational,
        relational2,
        streampipe,
        vecpipe,
    )

    return ALL_SPECS
