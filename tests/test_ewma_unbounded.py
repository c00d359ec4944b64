"""a24b_ewma_unbounded: the scan-free EWMA must (1) agree with a24's
literal fold to float tolerance — same math, different association —
and (2) plan WITHOUT any per-user array materialization (no
collect_list / aggregate-over-array), which is the whole point of the
unbounded form."""

from __future__ import annotations

from kafka_streaming_polymarket_pipeline_spark.plans import registry


def test_matches_fold_ewma(spark, sf_smoke):
    fold = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in registry.get("a24_ewma_per_user").builder(spark, sf_smoke).collect()
    }
    closed = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in registry.get("a24b_ewma_unbounded").builder(spark, sf_smoke).collect()
    }
    assert set(fold) == set(closed) and fold
    for u in fold:
        assert fold[u][0] == closed[u][0]  # n_events exact
        assert abs(fold[u][1] - closed[u][1]) <= 1e-6, u


def test_no_array_materialization(spark, sf_smoke):
    df = registry.get("a24b_ewma_unbounded").builder(spark, sf_smoke)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan
    # one exchange on user_id for the window; the groupBy reuses it
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in physical


def test_single_event_user(spark):
    # one event -> ewma == the value itself (seed coefficient 0.75^0)
    # build a minimal events-shaped frame via SQL temp view matching the
    # columns the builder touches (user_id, value, ts, event_id)
    df = spark.createDataFrame(
        [(7, 100, 3.5, "2024-01-01 00:00:00")],
        "user_id long, event_id long, value double, ts string",
    ).selectExpr("user_id", "event_id", "value", "CAST(ts AS TIMESTAMP) AS ts")
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = registry.get("a24b_ewma_unbounded").builder(spark, d).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 1 and abs(out[0]["ewma_value"] - 3.5) < 1e-9


def test_timeaware_single_exchange_and_weights(spark):
    # a24c: hand-computable 3-event series with known ages
    import tempfile, os
    import math

    df = spark.createDataFrame(
        [
            (1, 1, 10.0, "2024-01-01 00:00:00"),  # 2 days before tref -> w=0.25
            (1, 2, 20.0, "2024-01-02 00:00:00"),  # 1 day  before tref -> w=0.5
            (1, 3, 40.0, "2024-01-03 00:00:00"),  # tref              -> w=1
        ],
        "user_id long, event_id long, value double, ts string",
    ).selectExpr("user_id", "event_id", "value", "CAST(ts AS TIMESTAMP) AS ts")
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    q = registry.get("a24c_ewma_timeaware").builder(spark, d)
    # plan-shape contract BEFORE execution: AQE's post-run re-plan can
    # split the tiny-data stage; the static plan is what scales.
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "collect_list" not in plan
    [row] = q.collect()
    want = (0.25 * 10 + 0.5 * 20 + 1 * 40) / (0.25 + 0.5 + 1)
    assert row["n_events"] == 3 and abs(row["ewma_value"] - round(want, 6)) < 1e-9
