"""Behavior tests for BM25 retrieval, count-min sketch, and PageRank
(the oracle battery proves engine-vs-SQL parity; these prove the
operators do what they claim): ranking sanity on a known corpus, the
CMS one-sided-error guarantee, and PageRank's stochastic properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import graph as G
from kafka_streaming_polymarket_pipeline_spark.operators import retrieval as R
from kafka_streaming_polymarket_pipeline_spark.operators import sketch as SK


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "apple apple apple apple"),
        (2, "banana cherry"),
        (3, "durian durian durian"),
        (4, "apple banana cherry durian"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_exact_match_doc_ranks_first(self, tiny_docs):
        got = R.bm25_topk(tiny_docs, [(0, "durian")], k=3).collect()
        assert got[0]["doc_id"] == 3 and got[0]["rank"] == 1
        # only docs containing the term appear
        assert {r["doc_id"] for r in got} == {3, 4}

    def test_multi_term_scores_sum(self, tiny_docs):
        """score(q='apple banana') == score('apple') + score('banana')
        per doc (BM25 is additive over query terms)."""
        both = {
            r["doc_id"]: r["score"]
            for r in R.bm25_topk(tiny_docs, [(0, "apple banana")], k=5).collect()
        }
        single = {}
        for qid, term in ((0, "apple"), (1, "banana")):
            for r in R.bm25_topk(tiny_docs, [(qid, term)], k=5).collect():
                single[r["doc_id"]] = single.get(r["doc_id"], 0.0) + r["score"]
        for doc_id, s in both.items():
            assert math.isclose(s, single[doc_id], abs_tol=2e-6), (doc_id, s, single[doc_id])

    def test_two_level_topk_equals_single_window(self, tiny_docs):
        """The bucketed partial top-k must return exactly what a plain
        global ranking would."""
        got = R.bm25_topk(tiny_docs, [(0, "apple"), (1, "banana cherry")], k=2)
        rows = sorted(map(tuple, got.collect()))
        # recompute expected from the k=5 (complete) result
        full = R.bm25_topk(tiny_docs, [(0, "apple"), (1, "banana cherry")], k=5)
        expected = sorted(
            tuple(r) for r in full.collect() if r["rank"] <= 2
        )
        assert rows == expected

    def test_length_normalization_prefers_short_doc(self, tiny_docs):
        """doc 0 (apple tf=2, len 3) must outscore doc 4 (tf=1, len 4)
        and doc 1 (tf=4, len 4) must outscore doc 0 — tf saturation with
        length normalization."""
        got = {r["doc_id"]: r["rank"] for r in R.bm25_topk(tiny_docs, [(0, "apple")], k=5).collect()}
        assert got[1] < got[0] < got[4]


class TestCMS:
    def test_estimate_never_underestimates(self, spark):
        rows = [(i % 7,) for i in range(1000)] + [(i,) for i in range(100, 400)]
        stream = spark.createDataFrame(rows, "key long")
        got = SK.cms_heavy_hitters(stream, "key", k=10).collect()
        assert len(got) == 10
        for r in got:
            assert r["overestimate"] >= 0, r
            assert r["cms_est"] >= r["exact_n"]

    def test_exact_on_collision_free_stream(self, spark):
        """With far fewer keys than buckets and depth 4, at least the
        min-row estimate of a dominant key should be exact or near."""
        stream = spark.createDataFrame([(1,)] * 500 + [(2,)] * 100, "key long")
        got = {r["key"]: r for r in SK.cms_heavy_hitters(stream, "key", k=2).collect()}
        assert got[1]["exact_n"] == 500 and got[1]["cms_est"] == 500
        assert got[2]["exact_n"] == 100 and got[2]["cms_est"] == 100


class TestPageRank:
    def test_mass_conserved_and_uniform_on_symmetric_cycle(self, spark):
        """On a k-regular graph (cycle), PR is exactly uniform; total
        mass is 1 regardless."""
        n = 10
        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges = spark.createDataFrame(
            [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)],
            "src long, dst long",
        )
        got = G.pagerank(nodes, edges, n_iter=3).collect()
        assert math.isclose(sum(r["pr"] for r in got), 1.0, abs_tol=1e-6)
        for r in got:
            assert math.isclose(r["pr"], 1.0 / n, abs_tol=1e-6)

    def test_hub_outranks_leaves_and_isolated(self, spark):
        """Star graph: the hub collects rank from every leaf; isolated
        node gets only teleport + dangling share."""
        nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
        # star: 0 <-> 1..4; node 5 isolated
        e = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
        edges = spark.createDataFrame(e, "src long, dst long")
        got = {r["node"]: r["pr"] for r in G.pagerank(nodes, edges, n_iter=3).collect()}
        assert got[0] > max(got[i] for i in range(1, 5))
        assert all(got[i] > got[5] for i in range(5))
        assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-6)

    def test_dangling_mass_not_lost(self, spark):
        """All-dangling graph (no edges): every round must redistribute
        the full mass uniformly, not decay it by the damping factor."""
        nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
        edges = spark.createDataFrame([], "src long, dst long")
        got = G.pagerank(nodes, edges, n_iter=3).collect()
        assert math.isclose(sum(r["pr"] for r in got), 1.0, abs_tol=1e-6)
        for r in got:
            assert math.isclose(r["pr"], 0.25, abs_tol=1e-6)


class TestCMSStreaming:
    def test_streaming_counters_equal_batch(self, spark, tmp_path):
        """The CMS counter build is a standard streaming agg with state
        bounded at d x w rows: drained over multiple micro-batches it
        must equal the batch counters on the same data."""
        import json

        from kafka_streaming_polymarket_pipeline_spark.streaming import jobs

        src = tmp_path / "cms_stream"
        src.mkdir()
        for fi in range(3):
            with open(src / f"f{fi}.jsonl", "w") as f:
                for i in range(fi * 100, (fi + 1) * 100):
                    f.write(json.dumps({"key": i % 13}) + "\n")

        stream = (
            spark.readStream.schema("key long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        got = jobs.run_available_now(
            SK.cms_counters(stream, "key"), "t_cms", spark, mode="complete"
        )
        batch = SK.cms_counters(spark.read.schema("key long").json(str(src)), "key")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
        # state bound: never more than d x w counter rows
        assert got.count() <= SK.CMS_DEPTH * SK.CMS_WIDTH


class TestHLLStreamingBounds:
    def test_streaming_registers_state_bound_and_band(self, spark, tmp_path):
        """The portable-HLL register build (a17's substrate) is a pure
        groupBy-max — a mergeable streaming aggregation whose state is
        bounded at groups x m rows forever. Drained over micro-batches
        it must equal the batch registers bit-for-bit, so the finalized
        estimate (a query-time step over the tiny register table) is
        identical too — the cardinality leg of the monitor family
        (PSI/KS/W1 drift, CMS frequency, HLL cardinality)."""
        import json

        from kafka_streaming_polymarket_pipeline_spark.streaming import jobs

        src = tmp_path / "hll_stream"
        src.mkdir()
        for fi in range(3):
            with open(src / f"f{fi}.jsonl", "w") as f:
                for i in range(fi * 200, (fi + 1) * 200):
                    f.write(json.dumps({"grp": i % 2, "u": i % 331}) + "\n")

        stream = (
            spark.readStream.schema("grp long, u long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        got = jobs.run_available_now(
            SK.hll_registers(stream, "grp", "u"), "t_hll", spark, mode="complete"
        )
        batch_src = spark.read.schema("grp long, u long").json(str(src))
        batch = SK.hll_registers(batch_src, "grp", "u")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
        # state bound: <= groups x m register rows
        assert got.count() <= 2 * SK.HLL_M
        # finalized estimates agree exactly (same registers -> same math)
        est_s = {r["grp"]: r["hll_est"] for r in SK.hll_estimate(got, "grp").collect()}
        est_b = {r["grp"]: r["hll_est"] for r in SK.hll_estimate(batch, "grp").collect()}
        assert est_s == est_b
        # sanity: both groups saw <= 331 distinct users; estimate within band
        for v in est_s.values():
            assert 100 <= v <= 450


class TestBloom:
    def test_no_false_negatives_and_low_fp(self, spark):
        keys = spark.createDataFrame([(f"key{i}",) for i in range(200)], "g string")
        bloom = SK.bloom_build(keys, "g")
        # every inserted key must probe True
        probed_in = SK.bloom_probe(keys, bloom, "g")
        assert all(r["maybe"] for r in probed_in.collect())
        # absent keys: overwhelmingly False (fp rate ~ (fill)^k, tiny here)
        absent = spark.createDataFrame([(f"other{i}",) for i in range(500)], "g string")
        fp = sum(r["maybe"] for r in SK.bloom_probe(absent, bloom, "g").collect())
        assert fp <= 10, fp

    def test_filter_is_bounded(self, spark):
        keys = spark.createDataFrame([(f"k{i}",) for i in range(5000)], "g string")
        assert SK.bloom_build(keys, "g").count() <= SK.BLOOM_WORDS


class TestHLL:
    def test_error_within_band_across_cardinalities(self, spark):
        """1.04/sqrt(256) ~ 6.5% standard error; assert within 4 sigma
        at several cardinalities (deterministic hashing -> fixed error)."""
        for n in (50, 500, 5000):
            df = spark.createDataFrame([(1, i) for i in range(n)], "grp int, key long")
            est = SK.hll_distinct(df, "grp", "key").collect()[0]["hll_est"]
            assert abs(est - n) / n < 0.26, (n, est)

    def test_duplicates_do_not_move_estimate(self, spark):
        """Distinct-count property: multiplicity must not change registers."""
        once = spark.createDataFrame([(1, i) for i in range(300)], "grp int, key long")
        tenx = spark.createDataFrame(
            [(1, i) for i in range(300) for _ in range(10)], "grp int, key long"
        )
        a = SK.hll_distinct(once, "grp", "key").collect()[0]["hll_est"]
        b = SK.hll_distinct(tenx, "grp", "key").collect()[0]["hll_est"]
        assert a == b


# --- Property tests (hypothesis): invariants under random inputs ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
_doc = st.lists(_words, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=2, max_size=12), qwords=st.lists(_words, min_size=1, max_size=3))
def test_bm25_bucketing_invariance(spark, texts, qwords):
    """The two-level top-k must be invariant to TOPK_BUCKETS — 1 bucket
    (degenerate single window) and 64 buckets give identical results."""
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    q = [(0, " ".join(qwords))]
    orig = R.TOPK_BUCKETS
    try:
        R.TOPK_BUCKETS = 1
        one = sorted(map(tuple, R.bm25_topk(docs, q, k=4).collect()))
        R.TOPK_BUCKETS = 64
        many = sorted(map(tuple, R.bm25_topk(docs, q, k=4).collect()))
    finally:
        R.TOPK_BUCKETS = orig
    assert one == many


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60))
def test_cms_one_sided_error_property(spark, keys):
    stream = spark.createDataFrame([(k,) for k in keys], "key long")
    for r in SK.cms_heavy_hitters(stream, "key", k=5).collect():
        assert r["cms_est"] >= r["exact_n"], r


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=40))
def test_bloom_never_false_negative_property(spark, keys):
    df = spark.createDataFrame([(k,) for k in set(keys)], "g string")
    bloom = SK.bloom_build(df, "g")
    assert all(r["maybe"] for r in SK.bloom_probe(df, bloom, "g").collect())


class TestHLLStreaming:
    def test_streaming_registers_equal_batch(self, spark, tmp_path):
        """HLL registers are ONE max-aggregation — streaming state
        bounded at groups x m rows with a single stateful operator (the
        estimate finalization is a query-time batch step); drained over
        micro-batches, registers AND the finalized estimate must equal
        the batch build exactly (mergeable-by-max property)."""
        import json

        from kafka_streaming_polymarket_pipeline_spark.streaming import jobs

        src = tmp_path / "hll_stream"
        src.mkdir()
        for fi in range(3):
            with open(src / f"f{fi}.jsonl", "w") as f:
                for i in range(fi * 200, (fi + 1) * 200):
                    f.write(json.dumps({"grp": i % 2, "key": i % 150}) + "\n")

        stream = (
            spark.readStream.schema("grp int, key long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        regs = jobs.run_available_now(
            SK.hll_registers(stream, "grp", "key"), "t_hll", spark, mode="complete"
        )
        batch_df = spark.read.schema("grp int, key long").json(str(src))
        batch_regs = SK.hll_registers(batch_df, "grp", "key")
        assert sorted(map(tuple, regs.collect())) == sorted(map(tuple, batch_regs.collect()))
        # finalizing the streamed registers gives the batch estimate exactly
        got_est = SK.hll_estimate(regs, "grp")
        batch_est = SK.hll_distinct(batch_df, "grp", "key")
        assert sorted(map(tuple, got_est.collect())) == sorted(map(tuple, batch_est.collect()))


class TestSampleQuantiles:
    def _mk(self, spark, n, grp="a", seed=7):
        import random

        rng = random.Random(seed)
        rows = [(i, grp, rng.gauss(100.0, 15.0)) for i in range(n)]
        return spark.createDataFrame(rows, "event_id long, g string, v double")

    def test_small_group_is_exact(self, spark):
        """n <= k: the sample IS the group, estimates equal a12's exact
        percentiles."""
        df = self._mk(spark, 300)
        got = SK.sample_quantile_sketch(df, "g", "v", "event_id", k=512).collect()[0]
        exact = df.selectExpr(
            "round(percentile(v, 0.5), 4) p50", "round(percentile(v, 0.95), 4) p95"
        ).collect()[0]
        assert got["sample_k"] == 300 and got["n_events"] == 300
        assert got["est_p50"] == exact["p50"] and got["est_p95"] == exact["p95"]

    def test_estimates_within_rank_band(self, spark):
        """k=512 over 20k rows: each estimate must land within a generous
        rank band of the exact quantile (O(1/sqrt(k)) ~ 4.4% rank error;
        assert 3 sigma)."""
        df = self._mk(spark, 20_000)
        got = SK.sample_quantile_sketch(df, "g", "v", "event_id", k=512).collect()[0]
        for q, est in [(0.5, got["est_p50"]), (0.95, got["est_p95"])]:
            lo, hi = max(q - 0.13, 0.0), min(q + 0.13, 1.0)
            band = df.selectExpr(
                f"percentile(v, {lo}) lo", f"percentile(v, {hi}) hi"
            ).collect()[0]
            assert band["lo"] <= est <= band["hi"], (q, est, band)

    def test_threshold_filter_loses_nothing(self, spark):
        """The two-phase plan (count -> hash-threshold -> window) must
        equal the naive full-sort bottom-k on the same data."""
        from pyspark.sql import Window

        df = self._mk(spark, 5_000)
        got = SK.sample_quantile_sketch(df, "g", "v", "event_id", k=64).collect()[0]
        h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast("long")
        w = Window.partitionBy("g").orderBy(F.asc("_h"), F.asc("event_id"))
        naive = (
            df.withColumn("_h", h)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 64)
            .groupBy("g")
            .agg(
                F.round(F.expr("percentile(v, 0.5)"), 4).alias("p50"),
                F.round(F.expr("percentile(v, 0.99)"), 4).alias("p99"),
            )
            .collect()[0]
        )
        assert got["est_p50"] == naive["p50"] and got["est_p99"] == naive["p99"]
        assert got["sample_k"] == 64

    def test_merge_law(self, spark):
        """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
        property that makes per-partition sketches combinable."""
        import random

        rng = random.Random(13)
        rows = [(i, rng.random()) for i in range(4_000)]
        a, b = rows[:2_500], rows[2_500:]

        def bottomk(rs, k=64):
            import hashlib

            keyed = sorted(
                rs, key=lambda r: (int(hashlib.md5(str(r[0]).encode()).hexdigest()[:8], 16), r[0])
            )
            return keyed[:k]

        merged_full = bottomk(rows)
        merged_sketches = bottomk(bottomk(a) + bottomk(b))
        assert merged_full == merged_sketches


class TestKCorePeel:
    def _pairs(self, spark, edges):
        return spark.createDataFrame(edges, "va long, vb long")

    def test_triangle_survives_chain_peels(self, spark):
        """Triangle {0,1,2} + tail 2-3-4-5: one leaf LAYER peels per round
        (5, then 4, then 3); the triangle is the 2-core. At rounds=3 node
        2's reported degree is still 3 — the final round computed degrees
        over the PREVIOUS survivors {0,1,2,3}, the documented contract —
        and one more round settles it to the in-core degree 2."""
        from kafka_streaming_polymarket_pipeline_spark.operators import graph as G

        pairs = self._pairs(
            spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
        )
        got = {r.node: r.degree for r in G.kcore_peel(pairs, k=2, rounds=3).collect()}
        assert got == {0: 2, 1: 2, 2: 3}
        settled = {
            r.node: r.degree for r in G.kcore_peel(pairs, k=2, rounds=4).collect()
        }
        assert settled == {0: 2, 1: 2, 2: 2}

    def test_fixed_rounds_is_superset_of_fixpoint(self, spark):
        """A 5-node chain under k=2 peels end-layers inward: 3 interior
        survivors after round 1, 1 after round 2, empty (the true core)
        at round 3 — each fixed-round survivor set a superset of the
        fixpoint, the documented monotone-convergence contract."""
        from kafka_streaming_polymarket_pipeline_spark.operators import graph as G

        chain = self._pairs(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
        assert G.kcore_peel(chain, k=2, rounds=1).count() == 3  # interior
        assert G.kcore_peel(chain, k=2, rounds=2).count() == 1  # center
        assert G.kcore_peel(chain, k=2, rounds=3).count() == 0  # fixpoint

    def test_clique_degrees_reported(self, spark):
        from kafka_streaming_polymarket_pipeline_spark.operators import graph as G

        k4 = self._pairs(
            spark, [(a, b) for a in range(4) for b in range(a + 1, 4)]
        )
        got = {r.node: r.degree for r in G.kcore_peel(k4, k=3, rounds=2).collect()}
        assert got == {i: 3 for i in range(4)}
