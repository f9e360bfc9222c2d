"""PLINK .raw text ingest → the Parquet-backed fact table.

Reference: S1-S4 (daxos/read.py:48-96,153-156 — whitespace text, 6 fixed
metadata columns then SNP dosage columns; PHENOTYPE 1/2 recoded to 0/1
when binary) and S17 dosage recode (Snakefile:194-226).

Spark-first shape (SURVEY §1.5): ONE DataFrame
    row_idx:long, fid, iid, pat, mat, sex:float, phenotype:float,
    label:float, features:array<float>
plus a small ``cols`` dim table (pos:int, snp:string). The reference's
chunked reader (S2) is unnecessary — the CSV scan is already partitioned
and streaming; its positional row identity is replaced by row_idx
(operators/indexing.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import FloatType, StringType, StructField, StructType

from ..operators.indexing import shuffled_with_row_idx, with_row_idx

FAM_COLS = ("FID", "IID", "PAT", "MAT", "SEX", "PHENOTYPE")


@dataclass
class MatrixDataset:
    """The {x, y, rows, cols} container (daxos read.py:99-110) as a
    fact DataFrame + cols dim."""

    fact: DataFrame
    cols: DataFrame  # (pos:int, snp:string)

    @property
    def n_features(self) -> int:
        return self.cols.count()


def read_plink_colnames(spark: SparkSession, path: str) -> list[str]:
    """S4 header scan (read.py:153-156): first line split on whitespace."""
    first = spark.read.text(path).limit(1).collect()[0][0]
    return first.strip().split()


def read_plink_raw(
    spark: SparkSession,
    path: str,
    shuffle_seed: int | None = None,
    recode_binary_label: bool = True,
) -> MatrixDataset:
    """S1+S3: whitespace CSV → fact DataFrame with features array.

    shuffle_seed: if set, applies the at-rest global pre-shuffle (X4)
    while assigning row_idx; None keeps file order.
    """
    colnames = read_plink_colnames(spark, path)
    snp_names = colnames[len(FAM_COLS) :]
    schema = StructType(
        [StructField(c, StringType() if i < 4 else FloatType(), True) for i, c in enumerate(colnames[:6])]
        + [StructField(c, FloatType(), True) for c in snp_names]
    )
    raw = (
        spark.read.option("delimiter", " ")
        .option("header", True)
        .schema(schema)
        .csv(path)
    )
    fact = raw.select(
        F.col("FID").alias("fid"),
        F.col("IID").alias("iid"),
        F.col("PAT").alias("pat"),
        F.col("MAT").alias("mat"),
        F.col("SEX").alias("sex"),
        F.col("PHENOTYPE").alias("phenotype"),
        F.array(*[F.col(f"`{s}`") for s in snp_names]).alias("features"),
    )

    # A4 recode guard: 1/2 phenotype → 0/1 label. The reference tests
    # only max==2 (read.py:91-94); here the whole value set must be
    # ⊆ {1,2} so a quantitative phenotype that happens to top out at
    # 2.0 is never silently shifted (documented strictness delta).
    label = F.col("phenotype")
    if recode_binary_label:
        row = fact.agg(
            F.max("phenotype").alias("mx"),
            F.sum((~F.col("phenotype").isin(1.0, 2.0)).cast("int")).alias("n_other"),
        ).collect()[0]
        if row["mx"] is not None and float(row["mx"]) == 2.0 and (row["n_other"] or 0) == 0:
            label = F.col("phenotype") - F.lit(1.0)
    fact = fact.withColumn("label", label.cast("float"))

    if shuffle_seed is not None:
        fact = shuffled_with_row_idx(fact, seed=shuffle_seed)
    else:
        fact = with_row_idx(fact)

    cols = spark.createDataFrame(
        [(i, s) for i, s in enumerate(snp_names)], "pos int, snp string"
    )
    return MatrixDataset(fact=fact.select("row_idx", *[c.lower() for c in FAM_COLS], "label", "features"), cols=cols)


def write_matrix(ds: MatrixDataset, path: str, mode: str = "overwrite") -> None:
    """S12-S14 combined sink (read.py:165-181) → Parquet pair."""
    ds.fact.write.mode(mode).parquet(f"{path}/fact.parquet")
    ds.cols.write.mode(mode).parquet(f"{path}/cols.parquet")


def read_matrix(spark: SparkSession, path: str) -> MatrixDataset:
    """S5-S7 combined scan + validation (read.py:99-124)."""
    fact = spark.read.parquet(f"{path}/fact.parquet")
    cols = spark.read.parquet(f"{path}/cols.parquet")
    # cardinality agreement asserts (read.py:103-105) — cheap: one row
    n_feat = cols.count()
    width = fact.select(F.size("features").alias("w")).limit(1).collect()
    if width and width[0]["w"] != n_feat:
        raise ValueError(f"features width {width[0]['w']} != cols table {n_feat}")
    return MatrixDataset(fact=fact, cols=cols)
