"""daxos_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference (seafloor/daxos), rebuilt
from scratch on idiomatic Spark.

Layout:
    session      SparkSession builder tuned for local[32] testing and
                 cluster-scale defaults (AQE, partition sizing).
    catalog      table loading / temp-view registration for the synthetic
                 TPC-H-ish test tables.
    sources/     ingest: PLINK .raw text, covariate tables, ID lists,
                 Parquet matrix round-trip.
    operators/   relational operators over the fact table: subsetting
                 (semi/anti joins, column projection on array<float>),
                 splits (fold columns, seeded train/test), aggregations.
    functions/   scalar/vector function surface: text analysis, portable
                 hashing, dedup (exact/minhash/simhash/jaccard), vector
                 similarity.
    ml/          closed-form residualization, CV + random HP search,
                 GBT training (MLlib), Platt scaling, Boruta, scoring.
    plans/       plan-inspection helpers (pushdown / broadcast asserts).
    streaming/   Structured Streaming ingest + windowed aggregation.
    multimodal/  binary-column (image/audio) plumbing with stubbed codecs.
"""

__version__ = "0.1.0"
