"""Every registered query must match its DuckDB oracle on sf0.001.

This mirrors the driver's t2 correctness gate (which runs at sf0.01);
sf0.001 keeps the suite fast for per-commit runs. A nightly-style full
check at sf0.01 is in test_oracle_sf001 (marked slow).
"""

from __future__ import annotations

import pytest

from kafka_streaming_polymarket_pipeline_spark import plans
from tests.oracle import check_query

ALL = sorted(plans.all_queries())

# Oracle-side cost outliers at sf0.001 (the DuckDB recursive Viterbi /
# doc-grain-closure CTEs, measured r11: 197 s + 122 s + 57 s of the
# 723 s battery): marked slow so the default per-commit battery stays
# bounded. They remain in the slow sf0.01 battery below, and both e2e
# compositions lead the r11 driver-prefix rotation, so each still gets
# an official hash row.
_ORACLE_HOGS = {"e2e_corpus_build_v", "e2e_corpus_build_g", "v3b_unigram_em2"}
SMOKE = [
    pytest.param(n, marks=pytest.mark.slow) if n in _ORACLE_HOGS else n for n in ALL
]


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle_smoke(spark, sf_smoke, name):
    check_query(spark, name, sf_smoke)


@pytest.mark.slow
@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle_sf001(spark, sf_correct, name):
    check_query(spark, name, sf_correct)


def test_approx_count_distinct_within_rsd(spark, sf_correct):
    """a13 has no SQL oracle (HLL implementations differ); assert the
    estimate lands within ~3x the configured 1% rsd of the exact count."""
    from kafka_streaming_polymarket_pipeline_spark import plans
    from kafka_streaming_polymarket_pipeline_spark.tables import load
    from pyspark.sql import functions as F

    approx = {
        r.event_type: r.approx_users
        for r in plans.get("a13_approx_count_distinct").builder(spark, sf_correct).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load(spark, sf_correct, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(0.03 * exact[k], 2), (k, est, exact[k])
