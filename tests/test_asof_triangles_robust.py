"""Behavior tests for the late-round-4 additions: the generic backward
AS-OF join (tie/unmatched semantics), degree-ordered triangle counting
(known graphs), MAD robust z-scores (shift/scale invariance), and the
EWMA fold (closed-form check). The oracle battery proves engine-vs-SQL
parity; these prove the operators' semantics on adversarial inputs."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import graph as G
from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import asof_join


def _ts(s: int):
    return datetime(2026, 1, 1) + timedelta(seconds=s)


class TestAsofJoin:
    def _frames(self, spark):
        build = spark.createDataFrame(
            [(1, _ts(10), 100.0), (1, _ts(20), 200.0), (2, _ts(15), 150.0)],
            "k long, ts timestamp, quote double",
        )
        probe = spark.createDataFrame(
            [
                (1, _ts(5), "before-any"),
                (1, _ts(10), "exact-tie"),
                (1, _ts(25), "after-both"),
                (2, _ts(15), "exact-tie-k2"),
                (3, _ts(30), "no-build-key"),
            ],
            "k long, ts timestamp, tag string",
        )
        return probe, build

    def test_backward_semantics_and_ties(self, spark):
        probe, build = self._frames(spark)
        got = {
            r["tag"]: r["quote"]
            for r in asof_join(probe, build, "k", "ts", ["quote"]).collect()
        }
        assert got["before-any"] is None          # nothing at-or-before
        assert got["exact-tie"] == 100.0          # equal ts matches (<=)
        assert got["after-both"] == 200.0         # latest prior, not first
        assert got["exact-tie-k2"] == 150.0
        assert got["no-build-key"] is None        # key absent from build

    def test_inner_drops_unmatched(self, spark):
        probe, build = self._frames(spark)
        got = asof_join(probe, build, "k", "ts", ["quote"], how="inner")
        assert {r["tag"] for r in got.collect()} == {
            "exact-tie", "after-both", "exact-tie-k2"
        }

    def test_single_shuffle_no_nested_loop(self, spark):
        probe, build = self._frames(spark)
        plan = (
            asof_join(probe, build, "k", "ts", ["quote"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        # union-marker scan: the only join machinery is the window sort
        assert "Window" in plan


class TestTriangleCount:
    def _count(self, spark, edges):
        df = spark.createDataFrame(edges, "va long, vb long")
        row = G.triangle_count(df).collect()[0]
        return row["n_edges"], row["n_triangles"]

    def test_single_triangle(self, spark):
        assert self._count(spark, [(1, 2), (1, 3), (2, 3)]) == (3, 1)

    def test_k4_has_four_triangles(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert self._count(spark, k4) == (6, 4)

    def test_star_is_triangle_free(self, spark):
        """Hub-and-spoke: the skew case degree orientation exists for —
        every edge orients spoke->hub, so the hub builds zero wedges."""
        star = [(0, i) for i in range(1, 9)]
        assert self._count(spark, star) == (8, 0)

    def test_triangle_plus_pendant(self, spark):
        assert self._count(spark, [(1, 2), (1, 3), (2, 3), (3, 4)]) == (4, 1)


class TestEwmaFold:
    def test_matches_closed_form(self, spark):
        """Fold EWMA s_i = 0.75*s_{i-1} + 0.25*x_i, s_0 = x_0 — compare
        the registered plan's fold against the Python recurrence."""
        vals = [3.0, -1.0, 4.0, 1.5, -9.26]
        rows = [(1, _ts(i), i, v) for i, v in enumerate(vals)]
        ev = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        )
        arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
        ewma = F.aggregate(
            F.transform(arr, lambda r: r["value"]),
            F.lit(None).cast("double"),
            lambda acc, x: F.coalesce(acc * F.lit(0.75) + F.lit(0.25) * x, x),
        )
        got = ev.groupBy("user_id").agg(ewma.alias("e")).collect()[0]["e"]
        want = vals[0]
        for x in vals[1:]:
            want = want * 0.75 + 0.25 * x
        assert math.isclose(got, want, rel_tol=1e-12)


class TestMergeableState:
    def test_three_slice_merge_equals_full(self, spark):
        """State merged from 3 arbitrary disjoint slices (one empty)
        equals the single-pass state over the union — the monoid law the
        a25 gate checks for the 2-slice case."""
        from kafka_streaming_polymarket_pipeline_spark.operators import scale as SC

        rows = [
            (i, _ts(i), i % 7, float((i * 37) % 100), "t%d" % (i % 3))
            for i in range(200)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double, event_type string"
        )
        slices = [
            ev.filter(F.col("event_id") % 3 == 0),
            ev.filter(F.col("event_id") % 3 == 1),
            ev.filter(F.col("event_id") % 3 == 2).filter(F.lit(False)),  # empty
            ev.filter(F.col("event_id") % 3 == 2),
        ]
        states = [SC.mergeable_state(s, "event_type", "value", "user_id") for s in slices]
        merged = SC.merge_states(states, "event_type")
        full = SC.merge_states(
            [SC.mergeable_state(ev, "event_type", "value", "user_id")], "event_type"
        )
        m = {r["event_type"]: r for r in merged.collect()}
        f = {r["event_type"]: r for r in full.collect()}
        assert set(m) == set(f)
        for t in f:
            assert m[t]["n_events"] == f[t]["n_events"]
            assert math.isclose(m[t]["sum_value"], f[t]["sum_value"], rel_tol=1e-12)
            assert m[t]["min_value"] == f[t]["min_value"]
            assert m[t]["max_value"] == f[t]["max_value"]
            assert m[t]["hll_est"] == f[t]["hll_est"]  # register merge is lossless


class TestPeakConcurrency:
    def test_cross_midnight_carry(self, spark):
        """Three sessions: A spans midnight, B and C sit inside day 2
        overlapping A — day 2's peak must count A via the carry-in even
        though A's boundaries both fall outside day 2's partition...
        except its -1 does land in day 2; the real assertion is that the
        two-level result equals the naive global sweep."""
        from kafka_streaming_polymarket_pipeline_spark.plans import get

        # Build events such that session_window(30min) yields:
        #   u1: 23:50 day1 -> 00:10 day2  (crosses midnight)
        #   u2: 00:05 day2 -> 00:06 day2
        #   u3: 00:07 day2 -> 00:08 day2
        base = datetime(2026, 3, 1, 23, 50)
        rows = [
            (1, base, 1, 0.0, "view"),
            (2, base + timedelta(minutes=20), 1, 0.0, "view"),       # 00:10 d2
            (3, base + timedelta(minutes=15), 2, 0.0, "view"),       # 00:05 d2
            (4, base + timedelta(minutes=16), 2, 0.0, "view"),       # 00:06 d2
            (5, base + timedelta(minutes=17), 3, 0.0, "view"),       # 00:07 d2
            (6, base + timedelta(minutes=18), 3, 0.0, "view"),       # 00:08 d2
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double, event_type string"
        )
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            ev.write.parquet(os.path.join(d, "events.parquet"))
            got = {
                r["day"].strftime("%Y-%m-%d"): r["peak_concurrency"]
                for r in get("w6_peak_concurrency").builder(spark, d).collect()
            }
        # day 1: only u1 active -> 1; day 2: u1 still open (carry-in 1)
        # plus u2 then u3 -> peak 2
        assert got == {"2026-03-01": 1, "2026-03-02": 2}


class TestBandJoin:
    def test_boundary_and_bucket_coverage(self, spark):
        """Pairs at exactly eps, just inside, and just outside — including
        a pair whose values straddle a bucket boundary (the case the
        3-bucket explode exists for)."""
        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import band_join

        probe = spark.createDataFrame(
            [(1, 1, 1.0), (1, 2, 10.0), (1, 3, 20.0), (2, 4, 5.0)],
            "k long, pid long, v double",
        )
        build = spark.createDataFrame(
            [
                (1, 101, 1.5),     # diff 0.5 exactly with pid=1 -> in (<=)
                (1, 102, 10.51),   # diff 0.51 -> out
                (1, 103, 19.75),   # diff 0.25, straddles bucket 39/40 -> in
                (2, 104, 5.2),     # other key -> in
                (3, 105, 5.0),     # key absent from probe -> no pair
            ],
            "k long, bid long, v double",
        )
        got = {
            (r["pid"], r["b_bid"])
            for r in band_join(probe, build, on="k", value_col="v", eps=0.5).collect()
        }
        assert got == {(1, 101), (3, 103), (4, 104)}

    def test_no_duplicate_pairs(self, spark):
        """A qualifying pair must appear exactly once even when probe and
        build share a bucket AND the neighbor bucket would also match."""
        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import band_join

        probe = spark.createDataFrame([(1, 1, 1.0)], "k long, pid long, v double")
        build = spark.createDataFrame([(1, 9, 1.0)], "k long, bid long, v double")
        rows = band_join(probe, build, on="k", value_col="v", eps=0.5).collect()
        assert len(rows) == 1


class TestPlanContracts:
    def test_a23_uses_take_ordered(self, spark):
        """The top-50 cut must compile to TakeOrderedAndProject (per-
        partition heaps + driver merge), never a global sort."""
        from kafka_streaming_polymarket_pipeline_spark.plans import get

        df = get("a23_mad_outliers").builder(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_w6_carry_window_input_is_calendar_bounded(self, spark):
        """The only unpartitioned window in w6 runs over per-day totals —
        assert its input row count equals the number of distinct days
        (the boundedness that makes the WindowExec warning provably
        benign)."""
        from kafka_streaming_polymarket_pipeline_spark.tables import load

        ev = load(spark, "/root/testdata/sf0.001", "events")
        sess = ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w")).agg(
            F.min("ts").alias("s"), F.max("ts").alias("e")
        )
        bounds = sess.select(F.col("s").alias("ts")).unionByName(
            sess.select(F.col("e").alias("ts"))
        ).withColumn("day", F.date_trunc("day", F.col("ts")))
        n_days = bounds.select("day").distinct().count()
        day_totals = bounds.groupBy("day").count()
        assert day_totals.count() == n_days
        assert n_days <= 366  # calendar-bounded, never data-bounded

    def test_j6_asof_single_exchange(self, spark):
        """The union-marker as-of plans exactly ONE data-scale shuffle
        (the window's hash partitioning on the key); more would mean the
        union or projection broke exchange reuse."""
        from kafka_streaming_polymarket_pipeline_spark.plans import get

        df = get("j6_asof_join").builder(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # row_number dedupe + as-of window both partition on user-keyed
        # hashes; accept <= 3 exchanges (dedupe, union sides) but never a
        # per-row or broadcast-nested pattern.
        assert plan.count("Exchange hashpartitioning") <= 3
        assert "BroadcastNestedLoopJoin" not in plan


class TestAsofVsPandas:
    def test_matches_pandas_merge_asof(self, spark):
        """Property check: the union-marker as-of equals pandas
        merge_asof(direction='backward', allow_exact_matches=True) on a
        pseudo-random keyed series (fixed seed — deterministic)."""
        import pandas as pd

        rng = __import__("random").Random(42)
        build_rows = sorted(
            {(rng.randint(1, 5), rng.randint(0, 500)) for _ in range(80)}
        )
        build_pd = pd.DataFrame(
            {
                "k": [k for k, t in build_rows],
                "ts": pd.to_datetime([_ts(t) for k, t in build_rows]),
                "q": [float(k * 1000 + t) for k, t in build_rows],
            }
        )
        probe_rows = [(rng.randint(1, 6), rng.randint(0, 520)) for _ in range(120)]
        probe_pd = pd.DataFrame(
            {
                "k": [k for k, t in probe_rows],
                "ts": pd.to_datetime([_ts(t) for k, t in probe_rows]),
                "pid": list(range(len(probe_rows))),
            }
        )
        want = pd.merge_asof(
            probe_pd.sort_values("ts", kind="mergesort"),
            build_pd.sort_values("ts", kind="mergesort"),
            on="ts", by="k", direction="backward", allow_exact_matches=True,
        ).set_index("pid")["q"].to_dict()

        got_rows = asof_join(
            spark.createDataFrame(probe_pd),
            spark.createDataFrame(build_pd),
            on="k", ts_col="ts", build_cols=["q"],
        ).collect()
        got = {r["pid"]: r["q"] for r in got_rows}
        assert len(got) == len(want)
        for pid, q in want.items():
            g = got[pid]
            assert (pd.isna(q) and g is None) or g == q, (pid, g, q)


class TestEditDist1Pairs:
    def test_all_three_edit_kinds_and_a_non_pair(self, spark):
        from kafka_streaming_polymarket_pipeline_spark.operators.dedup import editdist1_pairs

        df = spark.createDataFrame(
            [
                (1, "market"),
                (2, "markets"),   # insertion vs 1
                (3, "arket"),     # deletion vs 1
                (4, "marcet"),    # substitution vs 1
                (5, "Market"),    # distance 0 after lowering -> NOT a pair
                (6, "bucket"),    # distance > 1 from everything
            ],
            "rid long, name string",
        )
        got = {
            (r["rid_a"], r["rid_b"])
            for r in editdist1_pairs(df, "rid", "name").collect()
        }
        # markets/arket/marcet are each at distance 1 from "market" — and
        # therefore also from "Market", which lowercases to the identical
        # string (so (1,5) itself is distance 0: excluded). Cross pairs
        # among the three variants are all distance 2.
        assert got == {(1, 2), (1, 3), (1, 4), (2, 5), (3, 5), (4, 5)}

    def test_blocking_misses_nothing_vs_naive(self, spark):
        """Blocked pairs == naive all-pairs filter on a seeded random
        corpus of short strings (the completeness half of SymSpell)."""
        from kafka_streaming_polymarket_pipeline_spark.operators.dedup import editdist1_pairs

        rng = __import__("random").Random(7)
        names = list({
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 4)))
            for _ in range(40)
        })
        df = spark.createDataFrame(
            [(i, n) for i, n in enumerate(names)], "rid long, name string"
        )
        got = {
            (r["rid_a"], r["rid_b"])
            for r in editdist1_pairs(df, "rid", "name").collect()
        }
        naive = (
            df.alias("a")
            .join(df.alias("b"), F.col("a.rid") < F.col("b.rid"))
            .filter(F.levenshtein(F.lower("a.name"), F.lower("b.name")) == 1)
        )
        want = {(r[0], r[1]) for r in naive.select("a.rid", "b.rid").collect()}
        assert got == want and len(want) > 0


class TestRandomEquivalence:
    def test_band_join_matches_naive_filter(self, spark):
        """Blocked band join == naive range-predicate join on a seeded
        random frame (completeness + no-duplicates in one check)."""
        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import band_join

        rng = __import__("random").Random(11)
        probe = spark.createDataFrame(
            [(rng.randint(1, 4), i, rng.uniform(0, 20)) for i in range(60)],
            "k long, pid long, v double",
        )
        build = spark.createDataFrame(
            [(rng.randint(1, 4), 100 + i, rng.uniform(0, 20)) for i in range(60)],
            "k long, bid long, v double",
        )
        got = {
            (r["pid"], r["b_bid"])
            for r in band_join(probe, build, on="k", value_col="v", eps=0.7).collect()
        }
        naive = (
            probe.alias("a")
            .join(build.alias("b"), F.col("a.k") == F.col("b.k"))
            .filter(F.abs(F.col("a.v") - F.col("b.v")) <= 0.7)
            .select(F.col("a.pid"), F.col("b.bid"))
        )
        want = {(r[0], r[1]) for r in naive.collect()}
        assert got == want and len(want) > 0

    def test_triangle_count_matches_naive_3way(self, spark):
        """Degree-ordered node-iterator == naive id-ordered 3-way join on
        a seeded random graph with a planted hub (the skew shape)."""
        rng = __import__("random").Random(13)
        edges = {(0, i) for i in range(1, 15)}  # hub 0
        while len(edges) < 60:
            a, b = rng.randint(1, 25), rng.randint(1, 25)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        df = spark.createDataFrame(sorted(edges), "va long, vb long")
        got = G.triangle_count(df).collect()[0]["n_triangles"]
        e1, e2, e3 = df.alias("e1"), df.alias("e2"), df.alias("e3")
        want = (
            e1.join(e2, F.col("e2.va") == F.col("e1.vb"))
            .join(
                e3,
                (F.col("e3.va") == F.col("e1.va")) & (F.col("e3.vb") == F.col("e2.vb")),
            )
            .count()
        )
        assert got == want and want > 0


class TestEmptyInputs:
    def test_asof_empty_build_keeps_probes(self, spark):
        probe = spark.createDataFrame([(1, _ts(1), "x")], "k long, ts timestamp, tag string")
        build = spark.createDataFrame([], "k long, ts timestamp, quote double")
        rows = asof_join(probe, build, "k", "ts", ["quote"]).collect()
        assert len(rows) == 1 and rows[0]["quote"] is None

    def test_triangle_count_empty_graph(self, spark):
        empty = spark.createDataFrame([], "va long, vb long")
        row = G.triangle_count(empty).collect()[0]
        assert (row["n_edges"], row["n_triangles"]) == (0, 0)

    def test_band_join_empty_sides(self, spark):
        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import band_join

        p = spark.createDataFrame([(1, 1, 1.0)], "k long, pid long, v double")
        e = spark.createDataFrame([], "k long, bid long, v double")
        assert band_join(p, e, on="k", value_col="v", eps=0.5).count() == 0
        assert band_join(e.selectExpr("k", "bid as pid", "v"), p.selectExpr("k", "pid as bid", "v"),
                         on="k", value_col="v", eps=0.5).count() == 0

    def test_editdist_pairs_empty(self, spark):
        from kafka_streaming_polymarket_pipeline_spark.operators.dedup import editdist1_pairs

        e = spark.createDataFrame([], "rid long, name string")
        assert editdist1_pairs(e, "rid", "name").count() == 0

    def test_merge_states_single_empty_slice(self, spark):
        from kafka_streaming_polymarket_pipeline_spark.operators import scale as SC

        e = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, value double, event_type string"
        )
        merged = SC.merge_states(
            [SC.mergeable_state(e, "event_type", "value", "user_id")], "event_type"
        )
        assert merged.count() == 0


class TestAsofForwardVsPandas:
    def test_matches_pandas_merge_asof_forward(self, spark):
        """Property check for direction='forward': equals pandas
        merge_asof(direction='forward', allow_exact_matches=True) on a
        pseudo-random keyed series (fixed seed — deterministic),
        including exact-timestamp matches and unmatched tail probes."""
        import pandas as pd

        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import asof_join

        rng = __import__("random").Random(43)
        build_rows = sorted(
            {(rng.randint(1, 5), rng.randint(0, 500)) for _ in range(80)}
        )
        build_pd = pd.DataFrame(
            {
                "k": [k for k, t in build_rows],
                "ts": pd.to_datetime([_ts(t) for k, t in build_rows]),
                "q": [float(k * 1000 + t) for k, t in build_rows],
            }
        )
        probe_rows = [(rng.randint(1, 6), rng.randint(0, 520)) for _ in range(120)]
        probe_pd = pd.DataFrame(
            {
                "k": [k for k, t in probe_rows],
                "ts": pd.to_datetime([_ts(t) for k, t in probe_rows]),
                "pid": list(range(len(probe_rows))),
            }
        )
        want = pd.merge_asof(
            probe_pd.sort_values("ts", kind="mergesort"),
            build_pd.sort_values("ts", kind="mergesort"),
            on="ts", by="k", direction="forward", allow_exact_matches=True,
        ).set_index("pid")["q"].to_dict()

        got_rows = asof_join(
            spark.createDataFrame(probe_pd),
            spark.createDataFrame(build_pd),
            on="k", ts_col="ts", build_cols=["q"], direction="forward",
        ).collect()
        got = {r["pid"]: r["q"] for r in got_rows}
        assert len(got) == len(want)
        for pid, q in want.items():
            g = got[pid]
            assert (pd.isna(q) and g is None) or g == q, (pid, g, q)

    def test_forward_inner_drops_unmatched_and_rejects_bad_direction(self, spark):
        from datetime import datetime

        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import asof_join

        t0 = datetime(2024, 1, 1)
        probe = spark.createDataFrame(
            [(1, t0), (1, t0 + timedelta(hours=2))], "k long, ts timestamp"
        )
        build = spark.createDataFrame(
            [(1, t0 + timedelta(hours=1), 5.0)], "k long, ts timestamp, q double"
        )
        inner = asof_join(probe, build, on="k", ts_col="ts",
                          build_cols=["q"], how="inner", direction="forward")
        assert [(r["ts"], r["q"]) for r in inner.collect()] == [(t0, 5.0)]
        try:
            asof_join(probe, build, on="k", ts_col="ts",
                      build_cols=["q"], direction="nearest")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestAsofNearest:
    def test_nearest_picks_closer_side_and_ties_go_backward(self, spark):
        """j9's nearest rule on a constructed series: closer-after wins,
        closer-before wins, exact tie -> the backward (earlier) match,
        and a key with only one side still matches."""
        from datetime import datetime

        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import asof_join

        t0 = datetime(2024, 1, 1)

        def m(minutes):
            return t0 + timedelta(minutes=minutes)

        build = spark.createDataFrame(
            [(1, m(0), 10.0), (1, m(10), 20.0), (2, m(100), 30.0)],
            "k long, ts timestamp, q double",
        )
        probe = spark.createDataFrame(
            [
                (100, 1, m(2)),    # 2 min after q=10, 8 min before q=20 -> 10
                (101, 1, m(7)),    # 7 after q=10, 3 before q=20 -> 20
                (102, 1, m(5)),    # exact tie -> backward -> 10
                (103, 2, m(50)),   # only forward exists -> 30
            ],
            "pid long, k long, ts timestamp",
        )
        b2 = build.select("k", "ts", F.col("q").alias("bq"), F.col("ts").alias("bts"))
        f2 = build.select("k", "ts", F.col("q").alias("fq"), F.col("ts").alias("fts"))
        back = asof_join(probe, b2, on="k", ts_col="ts", build_cols=["bq", "bts"])
        fwd = asof_join(probe.select("pid", "k", "ts"), f2, on="k", ts_col="ts",
                        build_cols=["fq", "fts"], direction="forward")
        both = back.join(fwd.select("pid", "fq", "fts"), "pid")
        take_back = F.col("bq").isNotNull() & (
            F.col("fq").isNull()
            | (F.unix_micros("ts") - F.unix_micros("bts")
               <= F.unix_micros("fts") - F.unix_micros("ts"))
        )
        got = {
            r["pid"]: r["nearest"]
            for r in both.select(
                "pid", F.when(take_back, F.col("bq")).otherwise(F.col("fq")).alias("nearest")
            ).collect()
        }
        assert got == {100: 10.0, 101: 20.0, 102: 10.0, 103: 30.0}


class TestAsofInterpolate:
    """j11's operator: linear time interpolation between bracketing build
    rows, with exact-match / edge-extrapolation / empty-series contracts
    checked against hand-computed values."""

    def _run(self, spark, probe_rows, build_rows):
        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import (
            asof_interpolate,
        )

        t0 = datetime(2024, 1, 1)
        probe = spark.createDataFrame(
            [(i, k, t0 + timedelta(seconds=s)) for i, (k, s) in enumerate(probe_rows)],
            "pid long, k long, ts timestamp",
        )
        build = spark.createDataFrame(
            [(k, t0 + timedelta(seconds=s), v) for k, s, v in build_rows],
            "k long, ts timestamp, v double",
        )
        out = asof_interpolate(probe, build, on="k", ts_col="ts", value_col="v")
        return {r.pid: r.interp_value for r in out.collect()}

    def test_midpoint_and_quarter(self, spark):
        got = self._run(
            spark,
            [(1, 5), (1, 25)],                      # probes at t=5s, t=25s
            [(1, 0, 10.0), (1, 10, 20.0), (1, 30, 60.0)],
        )
        assert got[0] == 15.0                        # halfway 10 -> 20
        assert got[1] == 50.0                        # 3/4 along 20 -> 60

    def test_exact_match_takes_v0_with_no_float_edge(self, spark):
        got = self._run(spark, [(1, 10)], [(1, 0, 1.0), (1, 10, 2.0), (1, 20, 9.0)])
        assert got[0] == 2.0

    def test_flat_extrapolation_and_empty_series(self, spark):
        got = self._run(
            spark,
            [(1, 0), (1, 99), (2, 5)],
            [(1, 10, 7.0), (1, 20, 11.0)],           # key 2 has no series
        )
        assert got[0] == 7.0                          # before first -> v1 flat
        assert got[1] == 11.0                         # after last -> v0 flat
        assert got[2] is None

    def test_single_shuffle_plan(self, spark):
        """Both directions must come off ONE exchange of the union frame —
        the reason this isn't two asof_join calls."""
        from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import (
            asof_interpolate,
        )

        probe = spark.createDataFrame(
            [(1, 1, datetime(2024, 1, 1))], "pid long, k long, ts timestamp"
        )
        build = spark.createDataFrame(
            [(1, datetime(2024, 1, 1), 1.0)], "k long, ts timestamp, v double"
        )
        plan = asof_interpolate(
            probe, build, on="k", ts_col="ts", value_col="v"
        )._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan
