"""The driver records bench output from a bounded (2000-char) stdout tail
capture; round 6 lost its per-query map when the full-payload line outgrew
it (VERDICT r06 #1). These tests pin the round-7 contract: the compact
driver-facing line stays under bench.MAX_LINE_CHARS in the worst case,
short keys are unique and deterministic, the detail payload keeps full
fidelity, and the trim ladder degrades gracefully instead of overflowing.

Pure-Python tests — no SparkSession needed.
"""

from __future__ import annotations

import json

import bench


def _worst_case(names, heavy_names):
    """Worst-case inputs: max-width timing values, every query's min from
    a non-plurality pass except one (maximal anomaly set), several flaky
    entries, failed sentinel values, and both streaming dicts present."""
    timings = {n: 9999.999 for n in names}
    heavy = {n: 9999.999 for n in heavy_names}
    min_pass = {n: (1 if i else 0) for i, n in enumerate(names)}  # plurality=1
    flaky = {n: 1 for n in list(names)[:3]}
    stream = {"events": 1_000_000, "sec": 999.999, "events_per_sec": 999_999}
    sdedup = {"docs": 60_000, "batches": 5, "sec": 9999.999, "docs_per_sec": 99_999}
    # heavy tier: min-of-2 with its own bracketing probes; one heavy min
    # from a non-plurality pass (first name -> pass 0, plurality is 1)
    heavy_min_pass = {n: (1 if i else 0) for i, n in enumerate(heavy_names)}
    return bench.build_output(
        timings, heavy, stream, sdedup,
        sf=0.1, cpus=32, runs=2,
        control_secs=[9.999] * 4, min_pass=min_pass, flaky=flaky,
        heavy_control_secs=[9.999] * 3, heavy_min_pass=heavy_min_pass,
        heavy_runs=2,
    )


def test_headline_line_under_budget_worst_case():
    detail, line = _worst_case(bench.HEADLINE, bench.HEAVY)
    assert len(line) < bench.MAX_LINE_CHARS
    parsed = json.loads(line)
    # the driver-facing fields survive
    assert parsed["metric"] == "headline_suite_wall"
    assert parsed["unit"] == "sec"
    assert len(parsed["queries"]) == len(bench.HEADLINE)  # no trim needed
    assert len(parsed["heavy"]) == len(bench.HEAVY)
    assert parsed["detail"] == bench.DETAIL_FILE
    # anomaly attribution is capped, not unbounded
    assert len(parsed.get("anom", {})) <= 9  # 8 entries + "more" marker
    # heavy tier self-attribution survives on the line
    assert parsed["heavy_runs"] == 2
    assert parsed["heavy_control_ratio"] == round(9.999 / bench.CONTROL_BASELINE_SEC, 2)
    assert len(parsed["heavy_anom"]) == 1  # the single non-plurality pass
    # detail keeps FULL names and full attribution
    assert set(detail["queries"]) == set(bench.HEADLINE)
    assert set(detail["query_min_pass"]) == set(bench.HEADLINE)
    assert set(detail["heavy"]) == set(bench.HEAVY)
    assert len(detail["control_secs"]) == 4
    # r07 ADVICE: control layouts are separate AND documented in-payload
    assert "headline" in detail["control_layout"]
    assert len(detail["heavy_control_secs"]) == 3  # one per pass + final
    assert "heavy pass" in detail["heavy_control_layout"]
    assert set(detail["heavy_min_pass"]) == set(bench.HEAVY)


def test_heavy_controls_absent_when_tier_skipped():
    """BENCH_ALL mode passes no heavy controls: neither artifact should
    invent heavy attribution fields."""
    detail, line = bench.build_output(
        {"a_ok": 2.0}, {}, None, None, sf=0.1, cpus=32, runs=2,
        control_secs=[1.0], min_pass={"a_ok": 0}, flaky={},
    )
    parsed = json.loads(line)
    assert "heavy_control_ratio" not in parsed and "heavy_anom" not in parsed
    assert "heavy_control_secs" not in detail and "heavy_min_pass" not in detail


def test_bench_all_line_under_budget_via_trim_ladder():
    """SPARK_GRAFT_BENCH_ALL times all ~176 registered queries: the full
    map cannot fit, so the ladder must fold to the slowest entries with an
    omitted-count marker while the line stays parseable and under budget."""
    from kafka_streaming_polymarket_pipeline_spark import plans

    names = list(plans.all_queries())
    assert len(names) > 150
    # give every query a distinct timing so "slowest" is well-defined
    timings = {n: 9000.0 + i for i, n in enumerate(names)}
    detail, line = bench.build_output(
        timings, {}, None, None, sf=0.01, cpus=32, runs=1,
        control_secs=[1.0], min_pass={}, flaky={},
    )
    assert len(line) < bench.MAX_LINE_CHARS
    parsed = json.loads(line)
    assert parsed["q_omitted"] + len(parsed["queries"]) == len(names)
    # the kept entries are the slowest ones
    kept_vals = sorted(parsed["queries"].values(), reverse=True)
    assert kept_vals[-1] >= 9000.0 + len(names) - 1 - len(kept_vals) - 0.5
    # detail still has everything
    assert len(detail["queries"]) == len(names)


def test_short_keys_unique_and_deterministic():
    from kafka_streaming_polymarket_pipeline_spark import plans

    names = sorted(plans.all_queries())
    keys = bench._short_keys(names)
    assert len(set(keys.values())) == len(names)  # injective
    assert keys == bench._short_keys(names)  # deterministic
    # representative spot checks of the scheme
    assert keys["d3_minhash_lsh"] == "d3"
    assert keys["q2_pq_adc_topk"] == "q2_pq"      # collides with q2_recall at depth 1
    assert keys["q2_recall"] == "q2_recall"


def test_heavy_tier_registered_and_subtotaled():
    from kafka_streaming_polymarket_pipeline_spark import plans

    registry = plans.all_queries()
    for n in bench.HEAVY:
        assert n in registry, f"HEAVY entry {n} not registered"
    detail, line = _worst_case(bench.HEADLINE, bench.HEAVY)
    assert detail["heavy_value"] == round(9999.999 * len(bench.HEAVY), 3)
    # mirror the line builder's own arithmetic (sum then 2-dp round):
    # 9999.999 * N does NOT round back to a clean 10000*N for every N
    # (it did for 4 entries, not for 5 — float, not logic)
    assert json.loads(line)["heavy_value"] == round(9999.999 * len(bench.HEAVY), 2)


def test_failed_query_sentinels_excluded_from_totals():
    timings = {"a_ok": 2.0, "b_failed": -1.0}
    detail, line = bench.build_output(
        timings, {"h_failed": -1.0}, None, None, sf=0.1, cpus=32, runs=2,
        control_secs=[1.0], min_pass={"a_ok": 0}, flaky={},
    )
    assert detail["value"] == 2.0 and detail["heavy_value"] == 0.0
    parsed = json.loads(line)
    assert parsed["value"] == 2.0
    assert parsed["queries"]["b"] == -1.0  # sentinel visible, not summed
