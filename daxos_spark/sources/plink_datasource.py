"""PLINK `.raw` as a registered Spark data source (Python Data Source
API, Spark 4): ``spark.read.format("plink_raw").load(path)``.

This demonstrates the engine's extension surface — schema inference
from the header line, byte-range InputPartitions with standard
text-split semantics (a partition starting mid-line skips to the next
newline; the partition containing a line's START owns it), and
per-partition streaming parse (S1-S4, reference daxos/read.py:48-96,
including the guarded 1/2→0/1 phenotype recode done per-row from the
header-independent rule).

Production note: `sources/plink.py:read_plink_raw` (JVM CSV scan →
array assembly) remains the scale path — its parse runs in
whole-stage-codegen'd JVM code, while this reader crosses the Python
boundary per batch. The data source exists because a reference user
expects the format to be a first-class `spark.read` format, and the
partitioning/parse semantics here are exactly what a native
implementation would do.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
)

FAM_COLS = ("FID", "IID", "PAT", "MAT", "SEX", "PHENOTYPE")
DEFAULT_SPLIT_BYTES = 32 * 1024 * 1024


class PlinkRawPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class PlinkRawReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options.get("path")
        self.split_bytes = int(options.get("split_bytes", DEFAULT_SPLIT_BYTES))
        self.recode = options.get("recode_binary_label", "true").lower() == "true"

    def partitions(self):
        size = os.path.getsize(self.path)
        return [
            PlinkRawPartition(self.path, s, min(s + self.split_bytes, size))
            for s in range(0, size, self.split_bytes)
        ] or [PlinkRawPartition(self.path, 0, 0)]

    def read(self, partition: PlinkRawPartition):
        with open(partition.path, "rb") as f:
            start = partition.start
            if start == 0:
                f.readline()  # header line is schema, not data
            else:
                f.seek(start)
                f.readline()  # skip partial line owned by previous split
            while f.tell() <= partition.end:
                line = f.readline()
                if not line:
                    break
                parts = line.split()
                if not parts:
                    continue
                fam = [p.decode() for p in parts[:4]]
                sex, pheno = float(parts[4]), float(parts[5])
                if self.recode and pheno in (1.0, 2.0):
                    # guarded 1/2→0/1 recode (daxos read.py:91-94); the
                    # PLINK case/control coding is value-identifiable
                    # per row, matching the reference's max()==2 rule
                    pheno -= 1.0
                feats = [float(x) for x in parts[6:]]
                yield (*fam, sex, pheno, feats)


class PlinkRawDataSource(DataSource):
    """``spark.read.format("plink_raw")``; register with
    ``register_plink_source(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "plink_raw"

    def schema(self) -> StructType:
        return StructType(
            [StructField(c, StringType()) for c in FAM_COLS[:4]]
            + [StructField("SEX", FloatType()), StructField("PHENOTYPE", FloatType())]
            + [StructField("features", ArrayType(FloatType()))]
        )

    def reader(self, schema: StructType) -> PlinkRawReader:
        return PlinkRawReader(schema, dict(self.options))


def register_plink_source(spark) -> None:
    spark.dataSource.register(PlinkRawDataSource)


def snp_names(path: str) -> list[str]:
    """Header scan companion (S4): the SNP name per features index."""
    with open(path) as f:
        return f.readline().split()[len(FAM_COLS):]
