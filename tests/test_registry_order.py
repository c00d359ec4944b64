"""Registry-order invariants: the driver's correctness gate records only
the first 50 entries per round, so the rotation list must stay consistent
with the registry (a typo would silently waste a gate slot)."""

from __future__ import annotations

from kafka_streaming_polymarket_pipeline_spark import plans
from kafka_streaming_polymarket_pipeline_spark.plans import registry


def test_priority_names_all_registered():
    registered = set(plans.all_queries())
    unknown = [n for n in registry._DRIVER_PRIORITY if n not in registered]
    assert not unknown, f"priority list names unknown queries: {unknown}"


def test_priority_list_has_no_duplicates():
    names = registry._DRIVER_PRIORITY
    assert len(names) == len(set(names))


def test_gate_prefix_is_the_priority_list():
    ordered = list(plans.all_queries())
    assert ordered[: len(registry._DRIVER_PRIORITY)] == registry._DRIVER_PRIORITY


def test_oracles_follow_query_order():
    qs = list(plans.all_queries())
    os_ = list(plans.all_oracles())
    assert os_ == [n for n in qs if n in set(os_)]
