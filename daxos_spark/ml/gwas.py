"""GWAS association scan: per-SNP allelic odds ratios in one pass.

The reference validates its whole pipeline by simulating case/control
genotypes with known per-SNP odds ratios and checking that univariable
association recovers them (``examples/data/setup_data.py:122-165``
``check_odds_ratios`` / ``check_ors_reasonable``: APOE variants
``rs7412_T``/``rs429358_C`` at OR 3 and 5, recovered within ±0.5).

Here the same quantity — the allelic odds ratio of a 0/1/2-dosage SNP
against a binary phenotype — is computed for *all* SNPs in a single
distributed aggregation instead of p independent logistic regressions:

    a = alt alleles in cases      b = ref alleles in cases (2·n_case − a)
    c = alt alleles in controls   d = ref alleles in controls
    OR = (a·d) / (b·c)

This is the 2×2 allele-count contingency estimator, the standard GWAS
fast path; under the additive model it targets the same parameter as the
reference's univariable logistic fit. Scale shape: posexplode →
groupBy(pos) with conditional sums — one shuffle of p groups for a
whole 215k-SNP scan (the "p regressions in one aggregation" strategy
from SURVEY §7.2), vs the reference's per-SNP sklearn loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def allelic_or_from_long(long_df: DataFrame) -> DataFrame:
    """Per-SNP allelic odds ratios from long format.

    ``long_df`` columns: ``is_case`` (0/1 int), ``pos`` (SNP index),
    ``dosage`` (0/1/2 alt-allele count; nulls ignored per-SNP, matching
    the reference's per-column NaN drop, daxos/deconfound.py:45-47).

    Returns one row per ``pos`` with exact integer allele counts and
    ``odds_ratio`` (NULL when any contingency cell is empty) plus
    ``log_or_se`` (Woolf standard error) for CI construction.
    """
    is_case = F.col("is_case") == 1
    a = F.sum(F.when(is_case, F.col("dosage"))).cast("long")
    c = F.sum(F.when(~is_case, F.col("dosage"))).cast("long")
    n_case = F.count(F.when(is_case & F.col("dosage").isNotNull(), F.lit(1)))
    n_ctrl = F.count(F.when(~is_case & F.col("dosage").isNotNull(), F.lit(1)))
    agg = long_df.groupBy("pos").agg(
        n_case.alias("n_case"),
        n_ctrl.alias("n_ctrl"),
        a.alias("case_alt"),
        c.alias("ctrl_alt"),
    )
    b = 2 * F.col("n_case") - F.col("case_alt")
    d = 2 * F.col("n_ctrl") - F.col("ctrl_alt")
    cells = [F.col("case_alt"), b, F.col("ctrl_alt"), d]
    nonzero = (
        (F.col("case_alt") > 0) & (b > 0) & (F.col("ctrl_alt") > 0) & (d > 0)
    )
    odds = (F.col("case_alt") * d) / (b * F.col("ctrl_alt"))
    se = F.sqrt(sum((1.0 / cell for cell in cells), F.lit(0.0)))
    return agg.select(
        "pos",
        "n_case",
        "n_ctrl",
        "case_alt",
        "ctrl_alt",
        F.when(nonzero, odds).alias("odds_ratio"),
        F.when(nonzero, se).alias("log_or_se"),
    )


def allelic_odds_ratios(
    df: DataFrame,
    label_col: str = "label",
    features_col: str = "features",
) -> DataFrame:
    """Per-SNP allelic odds ratios over the matrix layout.

    ``df`` rows carry a binary label and an ``array<float>`` dosage
    vector (the engine's standard fact layout, SURVEY §7.0). One
    posexplode pass; no driver-side loop, no per-SNP model fits.
    """
    long_df = df.select(
        F.col(label_col).cast("int").alias("is_case"),
        F.posexplode(F.col(features_col)).alias("pos", "dosage"),
    ).select("is_case", "pos", F.col("dosage").cast("double").alias("dosage"))
    return allelic_or_from_long(long_df)


def prs_score(
    long_df: DataFrame, weights: DataFrame, sample_col: str = "vec_id"
) -> DataFrame:
    """Polygenic risk score per sample (plink ``--score`` analogue; the
    downstream consumer of the reference's sumstats/clumping surface,
    cf. daxos scripts' clump→refit flow and SURVEY §2 Q2).

    ``long_df``: (sample, pos, dosage) long genotypes; ``weights``:
    (pos, w) per-SNP effect weights — selected/clumped upstream and
    dimension-table sized, so the join broadcasts and the whole score
    is one map-side join + one groupBy(sample) sum: a full-biobank
    scoring pass shuffles sample-cardinality rows, nothing else.
    Weight×dosage products are summed in DECIMAL(25,6): with weights on
    the 1e-6 grid and integer dosages the sum is exact (associative →
    order-independent, the cross-engine hash discipline).
    """
    t = long_df.join(F.broadcast(weights), "pos")
    return (
        t.groupBy(sample_col)
        .agg(
            F.sum((F.col("w") * F.col("dosage")).cast("decimal(25,6)"))
            .cast("double")
            .alias("prs"),
            F.count(F.lit(1)).alias("n_snps"),
        )
    )


def king_kinship(long_df: DataFrame, sample_col: str = "vec_id") -> DataFrame:
    """Pairwise KING-robust kinship (Manichaikul et al. 2010, eq. 11 —
    the ``plink2 --make-king`` estimator; the relatedness-QC companion
    to the reference's sample-exclusion step, SURVEY §2 Q3):

        φ̂_ij = (N_Aa,Aa − 2·N_AA,aa) / (N_Aa^(i) + N_Aa^(j))

    with N_Aa,Aa = SNPs where both samples are heterozygous, N_AA,aa =
    SNPs with opposite homozygotes, N_Aa^(s) = sample s's heterozygous
    count over the shared SNP set. Input: (sample, pos, dosage 0/1/2)
    long genotypes. A pair with NO heterozygous sites on either side
    (fully homozygous samples, or a tiny shared-SNP set after QC) has
    an undefined estimator — φ̂ is NULL for such pairs, never a
    divide-by-zero job abort. The pair enumeration is a pos-keyed
    self-join (never all-pairs × all-SNPs materialized driver-side);
    this shuffles O(n²/2 · shared SNPs) pair rows, which is fine for
    QC-sized panels — at biobank scale block the sample set upstream
    (plink's own strategy) and run each block pair as an independent
    call; no blocking is implemented here.
    """
    a = long_df.select(
        F.col(sample_col).alias("si"), "pos", F.col("dosage").alias("gi")
    )
    b = long_df.select(
        F.col(sample_col).alias("sj"), "pos", F.col("dosage").alias("gj")
    )
    pairs = a.join(b, "pos").filter(F.col("si") < F.col("sj"))
    gi, gj = F.col("gi"), F.col("gj")
    agg = pairs.groupBy("si", "sj").agg(
        F.sum(((gi == 1) & (gj == 1)).cast("int")).cast("bigint").alias("n_het_het"),
        F.sum((((gi == 0) & (gj == 2)) | ((gi == 2) & (gj == 0))).cast("int"))
        .cast("bigint")
        .alias("n_opp_hom"),
        F.sum((gi == 1).cast("int")).cast("bigint").alias("n_het_i"),
        F.sum((gj == 1).cast("int")).cast("bigint").alias("n_het_j"),
        F.count(F.lit(1)).cast("bigint").alias("n_snps"),
    )
    denom = (F.col("n_het_i") + F.col("n_het_j")).cast("double")
    phi = F.when(
        denom > 0,
        (F.col("n_het_het") - 2.0 * F.col("n_opp_hom")).cast("double") / denom,
    )  # NULL when no hets on either side — never a DIVIDE_BY_ZERO abort
    return agg.withColumn("phi", phi)
