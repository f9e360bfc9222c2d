"""Every registered query must ANALYZE against the real harness parquet.

Round-1 lesson: the pytest fixtures typed `ts` as plain TIMESTAMP while
the harness parquet stores TIMESTAMP_NTZ, so an analysis-time
DATATYPE_MISMATCH in `q_asof_click_before_error` reached the driver
unseen and zeroed the round's benchmark. Resolving each plan's schema
against /root/testdata/sf0.001 catches any type-vs-harness-data mismatch
in milliseconds per query, with no execution.
"""

from __future__ import annotations

import pytest

from daxos_spark.plans import get_specs

SF_DIR = "/root/testdata/sf0.001"

_SPECS = get_specs()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_analyzes_on_harness_types(spark, name):
    df = _SPECS[name].spark(spark, SF_DIR)
    assert len(df.schema.fields) > 0


def test_asof_runs_on_ntz_events(spark):
    """End-to-end on real NTZ-typed events (the round-1 crash site)."""
    out = _SPECS["a1_asof_click_before_error"].spark(spark, SF_DIR).collect()
    assert len(out) > 0
    assert all(r["n_errors"] >= r["n_matched"] for r in out)
    assert all(r["total_gap_us"] >= 0 for r in out)


def test_session_stats_runs_on_ntz_events(spark):
    out = _SPECS["q_session_stats"].spark(spark, SF_DIR).collect()
    assert len(out) > 0
    assert all(r["total_span_us"] >= 0 for r in out)
