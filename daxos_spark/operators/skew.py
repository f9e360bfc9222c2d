"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool for EXTREME hot keys (one
key >> a whole executor's memory) or for engines/stages where AQE
can't see the skew (e.g. a skewed aggregation feeding a join). This is
the standard trick: left rows scatter across ``n_salts`` sub-keys,
right rows replicate to every sub-key, so one hot key's work spreads
over ``n_salts`` tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated
    ``n_salts``×. Result is identical to ``left.join(right, on, how)``
    for inner/left joins; the right side should be the smaller input
    (its rows are duplicated per salt).

    The salt is derived from a hash of the whole left row's key plus
    monotonically varying partition randomness — which salt a row lands
    on never affects the join result, only the task layout.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()), F.lit(n_salts))
    l = left.withColumn("__salt", salt.cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    r = right.withColumn("__salt", salts)
    return l.join(r, on + ["__salt"], how).drop("__salt")
