"""Sources & sinks (SURVEY §2.1): PLINK .raw text ingest, covariate
tables, ID lists, Parquet matrix round-trip."""
