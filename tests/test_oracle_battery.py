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


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle_smoke(spark, sf_smoke, name):
    check_query(spark, name, sf_smoke)


@pytest.mark.slow
@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle_sf001(spark, sf_correct, name):
    check_query(spark, name, sf_correct)
