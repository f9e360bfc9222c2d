"""Distance-based greedy clumping — the reference's LD clumping shape
(Q2, reference workflows/preprocessing/Snakefile:106-155: plink
``--clump`` drops SNPs within ``clump_kb`` of a better-p index SNP).

The reference shells out to plink with an LD (r²) panel; no genotype
panel ships here, so this implements the distance-window variant of
the same greedy algorithm (p-value-ordered index selection, window
exclusion) — the r² predicate would slot into ``_greedy`` as an extra
mask term against a broadcast LD matrix.

Distributed shape: ``groupBy(chrom).applyInPandas`` — chromosomes are
independent, each group's sumstats (≲ few million rows for real GWAS)
fits comfortably in one Arrow batch, and the greedy scan inside is
O(n log n) numpy. This is the honest at-scale layout: the sequential
dependency is intrinsic to greedy selection, so parallelism across
chromosomes is exactly the parallelism the problem admits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def ld_clump(
    sumstats: DataFrame,
    chrom_col: str = "chrom",
    pos_col: str = "pos",
    p_col: str = "pval",
    window: int = 250_000,
) -> DataFrame:
    """Greedy p-value-ordered clumping per chromosome.

    Returns the index SNPs: rows such that no previously-selected
    (better-p, tie-broken by position) row on the same chromosome lies
    within ``window`` of them. Output schema = input schema.
    """
    import numpy as np
    import pandas as pd

    schema: StructType = sumstats.schema

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([p_col, pos_col], kind="mergesort").reset_index(drop=True)
        pos = pdf[pos_col].to_numpy()
        alive = np.ones(len(pdf), dtype=bool)
        picked = np.zeros(len(pdf), dtype=bool)
        for i in range(len(pdf)):
            if not alive[i]:
                continue
            picked[i] = True
            alive &= np.abs(pos - pos[i]) > window
            alive[i] = False
        return pdf[picked]

    return sumstats.groupBy(chrom_col).applyInPandas(_greedy, schema)
