"""Relational operators over the fact table (SURVEY §2.2-2.5, §2.8):
row/column subsetting, deterministic indexing, splits/folds,
aggregation helpers."""
