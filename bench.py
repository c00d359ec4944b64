#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {name: sec}, "sf": ...}.

Each query is forced with a noop-format write (full pipeline execution, no
driver collect bottleneck) so the number measures distributed compute the way
a cluster run would. Set SPARK_GRAFT_BENCH_ALL=1 to time every registered
query instead of the headline subset.

Output contract (two artifacts since round 7): the FULL payload — 3-dp
timings under full query names, per-pass control probes, per-query
min-pass attribution, flaky log — is written to BENCH_DETAIL.json next
to this file; stdout ends with ONE compact JSON line (2-dp timings under
short keys, totals, control ratio, anomalies only) guaranteed under
MAX_LINE_CHARS, because the driver records the line from a bounded
stdout tail capture and r06's full-payload line outgrew it (the round's
artifact lost its per-query map — VERDICT r06 #1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline subset: the flagship query plus the heaviest representative of each
# operator family (TPC-H-style relational, gold features, dedup, ANN, text,
# streaming-semantics batch equivalents).
HEADLINE = [
    "market_candles_15m",     # flagship: interval-join + event-time OHLC
    "pricing_summary",        # TPC-H Q1-style wide agg scan
    "regional_revenue",       # TPC-H Q5-style 6-way join
    "shipping_priority_top10",  # join + agg + top-k
    "order_priority_check",   # exists-semijoin + agg
    "j2_interval_join",       # range join (as-of semantics)
    "a5_topk_per_group",      # window top-K
    "a7_downsample_last",     # latest-per-window dedup
    "p5_event_dispatch",      # multiplexed-stream routing
    "g1_momentum_volatility", # gold: window stddev/avg over time series
    "g3_concentration",       # gold: share-of-total window sums
    "d1_exact_dedup",         # exact dedup (hash groupBy)
    "d3_minhash_lsh",         # MinHash+LSH near-dup
    "d3c_minhash_lsh_dfpruned",  # DF-pruned LSH (boilerplate-blind production lever)
    "d3d_minhash_lsh_oph",  # OPH signatures (r10; one hash/shingle vs d3's 128)
    "c1_kmeans_assign",       # deterministic k-means (2 Lloyd rounds, hash-gated)
    "d8_semantic_dedup",      # SemDeDup: within-k-means-cell cosine pairs
    "t1_token_stats",         # text analysis over documents
    "t7_winnow_fingerprints", # winnowing fingerprints (window min per doc)
    "s1_ann_bruteforce_topk", # brute-force cosine top-k
    "s2_ann_ivf_topk",        # IVF-bucketed ANN (the scale path)
    "q2_pq_adc_topk",         # PQ-ADC ANN (memory-bound scale path)
    "q3_ivf_pq_topk",         # IVF-PQ composed index (cells + codes + rerank)
    "t12_bigram_lm_score",    # corpus bigram-LM quality scoring
    "b1_bm25_topk",           # BM25 retrieval (inverted index + 2-level top-k)
    "d10_semantic_decontam",  # broadcast eval-set decontamination
    "r8_market_share",        # TPC-H Q8-style 8-relation join head
    "t14_span_scrub",         # duplicated-span removal rewrite (Lee et al.)
    "j2b_bucketed_interval_join",  # range join via time-bucket equi-keys
    "u3_distinct_agg",        # exact distinct aggregation
    "u5_cube_revenue",        # CUBE grouping sets
    "w1_running_sum",         # frame-based running window
    "w2_session_windows",     # gap-based session windows
    "a12_percentiles",        # exact percentile distribution
    "q4_binary_hamming_topk", # binary sign-bit ANN (integer Hamming scan)
    "t16_quality_classifier", # hashed-feature linear quality scorer
    "a18_funnel_stages",      # ordered funnel (chained co-partitioned aggs)
    "a19_cohort_retention",   # cohort retention triangle
    "r17_small_qty_revenue",  # decorrelated per-part AVG head
    "x8_weighted_sample",     # Efraimidis-Spirakis weighted top-k draw
    "j6_asof_join",           # backward as-of join (union-marker scan)
    "j7_band_join",           # epsilon-bucketed numeric tolerance join
    "a25_incremental_state_merge",  # mergeable-state maintenance + HLL merge
    "w6_peak_concurrency",    # sweep-line concurrency (two-level prefix sum)
    "a26_column_profile",     # single-pass Deequ-style table profile
    "r21_waiting_suppliers",  # Q21-style semi+anti pair on the same fact
    "r11_important_parts",    # Q11-style HAVING vs global-average threshold
    "r20_excess_supply",      # Q20-style semi-join into grouped HAVING
    "u10_unpivot",            # UNPIVOT/melt via one Expand node
    "a24b_ewma_unbounded",    # scan-free EWMA (telescoped affine fold)
    "j9_asof_nearest_join",   # nearest as-of (two directional scans composed)
    "d17_paragraph_dedup",    # sub-document exact dedup + reassembly (r09)
    "t21_quality_lr_eval",    # train/score/AUC eval loop for the LR (r09)
    "v5_unigram_doc_ppl",     # doc perplexity under the in-engine-trained LM (r09)
    "x9c_dsir_lang_target",   # DSIR resample, non-degenerate lang target (r10)
    "d19_boilerplate_scrub",  # corpus-frequency template removal (r10)
    "t22_quality_lr_calibration",  # reliability diagram for the LR (r10)
]
# (e2e_corpus_build_g, like its four e2e siblings, stays out of bench:
# the compositions re-run operators the tiers already time — d18 alone
# is e2e_g's dominant cost and is heavy-tier-tracked.)

# Heavy tier: the most expensive registered operators, trend-tracked with
# their own subtotal so regressions in the expensive tier show up in the
# bench artifact instead of living only in SCALE.md probes. Timed for
# SPARK_GRAFT_BENCH_HEAVY_RUNS passes (default 2 since round 8: the r07
# artifact's min-of-1 recorded d12 at 69.6 s in a contention wave where
# the true trend was ~20-27 s — VERDICT r07 "what's wrong" #1; a second
# pass costs ~1 min and makes the min robust to a single wave). Each
# heavy pass is additionally bracketed by its own control probes
# (heavy_control_secs) so an outlier pass is self-explaining the way
# the headline tier's is.
HEAVY = [
    "d12_prefix_jaccard_join",      # AllPairs/PPJoin exact Jaccard
    "d13_keep_longest_per_cluster", # LSH -> CC -> per-cluster argmax
    "j10_interval_overlap_join",    # two-sided overlap join, day-ranked top-10
    "d14_neardup_auto",             # routed exact-Jaccard facade (r08; the
                                    # driver corpus routes to the LSH leg, so
                                    # this trends the banded funnel at 19/20
                                    # next to d12's AllPairs on the same task)
    "d15_containment_pairs",        # directed containment join (r08
                                    # continuation; 13.6 s cold / 6.8 s warm
                                    # at sf0.1 on arrival — 525k output pairs)
    "d18_paragraph_neardup",        # fuzzy sub-doc dedup: d3 funnel at
                                    # window grain (~30x the doc count) +
                                    # star-CC + reassembly (r09; ~110 s at
                                    # sf0.1 — the 128-perm signature agg
                                    # over windows dominates, per-partition
                                    # parallel at cluster scale)
    "d16_cross_containment",        # decontam-shaped cross-corpus
                                    # containment (r09; test split vs train
                                    # split over the same prefix machinery)
    "d12c_prefix_jaccard_dfpruned", # DF-pruned AllPairs (r10; d3c's cut on
                                    # d12's task — candidate mass collapses
                                    # to the answer set on this corpus, so
                                    # the delta vs d12 IS the boilerplate
                                    # candidate cost)
]

# The driver records bench output from a bounded stdout tail capture
# (r06's line outgrew it and the round lost its per-query map — VERDICT
# r06 #1). The compact driver-facing line stays under this budget; the
# full payload (3-dp timings, per-pass controls, per-query min-pass
# attribution, flaky log) goes to BENCH_DETAIL.json next to this file.
MAX_LINE_CHARS = 1800
DETAIL_FILE = "BENCH_DETAIL.json"


def _short_keys(names: list[str]) -> dict[str, str]:
    """Deterministic short keys for the compact stdout line: each name's
    first underscore-token, extended one token at a time until unique
    within the set ("d3_minhash_lsh" -> "d3"; "q2_pq_adc_topk" /
    "q2_recall" -> "q2_pq" / "q2_recall"). Full names live in the
    detail file."""
    from collections import Counter

    depth = {n: 1 for n in names}
    while True:
        keys = {n: "_".join(n.split("_")[: depth[n]]) for n in names}
        counts = Counter(keys.values())
        grew = False
        for n in names:
            if counts[keys[n]] > 1 and depth[n] < len(n.split("_")):
                depth[n] += 1
                grew = True
        if not grew:
            return keys


def build_output(
    timings: dict[str, float],
    heavy: dict[str, float],
    stream: dict | None,
    stream_dedup: dict | None,
    sf: float | None,
    cpus: int,
    runs: int,
    control_secs: list[float],
    min_pass: dict[str, int],
    flaky: dict[str, int],
    heavy_control_secs: list[float] | None = None,
    heavy_min_pass: dict[str, int] | None = None,
    heavy_runs: int | None = None,
) -> tuple[dict, str]:
    """(detail payload, compact driver-facing stdout line).

    The detail payload carries everything (full names, 3-dp, per-pass
    controls, full attribution). The line carries totals, 2-dp timings
    under short keys, control ratio, and only ANOMALOUS attribution
    (queries whose min came from a non-plurality pass, capped, plus any
    flaky queries) — and is guaranteed under MAX_LINE_CHARS by
    construction plus a trim ladder (tested in tests/test_bench_line.py)."""
    from collections import Counter

    control = round(min(control_secs), 3)
    total = sum(v for v in timings.values() if v > 0)
    heavy_total = sum(v for v in heavy.values() if v > 0)
    detail = {
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {n: round(v, 3) for n, v in timings.items()},
        "heavy": {n: round(v, 3) for n, v in heavy.items()},
        "heavy_value": round(heavy_total, 3),
        "streaming": stream,
        "streaming_dedup": stream_dedup,
        "sf": sf,
        "cpus": cpus,
        "runs_per_query": runs,
        "passes_separated_windows": True,
        "control_sec": control,
        # HEADLINE-tier probes only (r07 ADVICE: a heavy-tier probe was
        # appended here, silently breaking this documented mapping):
        "control_layout": "entry i ran before headline pass i; final "
                          "entry after the last headline pass",
        "control_secs": [round(c, 3) for c in control_secs],
        "query_min_pass": min_pass,
        "flaky_queries": flaky,
        "control_baseline_sec": CONTROL_BASELINE_SEC,
        "control_ratio": round(control / CONTROL_BASELINE_SEC, 2),
        # Scaling legibility (VERDICT r10 #8): the driver's low-core
        # comparison false-positived `suspect_cpus_ignored` by keying on
        # the ~45 sub-second headline queries, which at sf0.1 are
        # scheduling/fixed-overhead-bound — 8 cores is already enough
        # for them, so their 32-vs-8-core ratio is ~1 BY EXPECTATION.
        # Real core-count scaling lives in the queries below (and the
        # heavy/streaming tiers, which the r10 c8 artifact measured at
        # 1.4-1.7x); a scaling probe should key on these.
        "scaling_expectation": {
            "scale_floor_sec": 2.0,
            "compute_bound": sorted(
                n for n, v in {**timings, **heavy}.items() if v >= 2.0
            ),
            "overhead_bound_note": (
                "queries under 2s at this SF are fixed-overhead-bound; "
                "a ~1.0 low-core ratio there is expected, not evidence "
                "that the core count is ignored"
            ),
        },
    }
    heavy_control = None
    if heavy_control_secs:
        heavy_control = round(min(heavy_control_secs), 3)
        detail["heavy_runs"] = heavy_runs
        detail["heavy_control_layout"] = (
            "entry i ran before heavy pass i; final entry after the last "
            "heavy pass"
        )
        detail["heavy_control_secs"] = [round(c, 3) for c in heavy_control_secs]
        detail["heavy_control_ratio"] = round(heavy_control / CONTROL_BASELINE_SEC, 2)
        detail["heavy_min_pass"] = heavy_min_pass or {}

    short = _short_keys(sorted(set(timings) | set(heavy)))
    plurality = Counter(min_pass.values()).most_common(1)[0][0] if min_pass else 0
    anom = {
        short[n]: p for n, p in sorted(min_pass.items()) if p != plurality and n in short
    }
    compact = {
        "metric": "headline_suite_wall",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {short[n]: round(v, 2) for n, v in timings.items()},
        "heavy": {short[n]: round(v, 2) for n, v in heavy.items()},
        "heavy_value": round(heavy_total, 2),
        "streaming": stream,
        "streaming_dedup": stream_dedup,
        "sf": sf,
        "cpus": cpus,
        "runs_per_query": runs,
        "control_sec": control,
        "control_ratio": round(control / CONTROL_BASELINE_SEC, 2),
        "detail": DETAIL_FILE,
    }
    if heavy_control is not None:
        compact["heavy_runs"] = heavy_runs
        compact["heavy_control_ratio"] = round(
            heavy_control / CONTROL_BASELINE_SEC, 2
        )
        hplural = (
            Counter((heavy_min_pass or {}).values()).most_common(1)[0][0]
            if heavy_min_pass
            else 0
        )
        hanom = {
            short[n]: p
            for n, p in sorted((heavy_min_pass or {}).items())
            if p != hplural and n in short
        }
        if hanom:
            compact["heavy_anom"] = hanom
    if flaky:
        compact["flaky"] = {short.get(n, n): p for n, p in flaky.items()}
    if anom:
        if len(anom) > 8:  # attribution is advisory on the line; detail has it all
            anom = dict(list(anom.items())[:8]) | {"more": len(anom) - 8}
        compact["anom"] = anom

    def _dump(d: dict) -> str:
        return json.dumps(d, separators=(",", ":"))

    line = _dump(compact)
    # Trim ladder (never expected to fire — the worst-case line is tested
    # well under budget — but the capture budget is a hard driver contract):
    # drop advisory attribution, then fold per-query maps into the N
    # slowest entries + an omitted-count marker.
    if len(line) > MAX_LINE_CHARS:
        compact.pop("anom", None)
        compact.pop("heavy_anom", None)
        compact.pop("flaky", None)
        line = _dump(compact)
    keep = len(compact["queries"])
    while len(line) > MAX_LINE_CHARS and keep > 5:
        keep -= 5
        slowest = dict(
            sorted(compact["queries"].items(), key=lambda kv: -kv[1])[:keep]
        )
        compact["queries"] = slowest
        compact["q_omitted"] = len(timings) - keep
        line = _dump(compact)
    return detail, line


def streaming_throughput(spark, sf_dir: str, n_rows: int = 1_000_000) -> dict:
    """End-to-end streaming pipeline throughput: bronze JSONL files ->
    file-source stream -> from_json silver parse -> 15-min OHLC candle agg
    -> noop sink, availableNow. This is the reference's whole data path
    (Kafka JSON -> typed -> windowed analytics), which it sustains at ~235
    events/s (BASELINE.md); the events/s here is the comparable number.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark import schemas, silver
    from kafka_streaming_polymarket_pipeline_spark.streaming import jobs
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        # Materialize n_rows bronze-envelope JSONL rows from the events table
        # (replicated with shifted timestamps when the table is smaller, so
        # the stream carries distinct event-time traffic, not one hot window).
        base_events = load(spark, sf_dir, "events")
        n_base = base_events.count()
        reps = max(n_rows // max(n_base, 1), 1)
        events = (
            base_events.crossJoin(spark.range(reps).select(F.col("id").alias("_rep")))
            .withColumn("ts", F.col("ts") + F.make_interval(hours=F.col("_rep") * 24))
            .drop("_rep")
            .limit(n_rows)
        )
        payload = F.to_json(
            F.struct(
                F.lit("BTC").alias("symbol"),
                F.col("value").alias("price"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("timestamp"),
                F.col("value").alias("volume"),
            )
        )
        bronze = events.select(
            F.lit("asset-prices").alias("topic"),
            F.lit(0).alias("partition"),
            F.col("event_id").alias("offset"),
            F.col("ts").alias("kafka_timestamp"),
            F.col("ts").alias("ingested_at"),
            payload.alias("payload"),
        )
        src = os.path.join(tmp, "in")
        bronze.repartition(8).write.json(src)
        n = spark.read.schema(schemas.BRONZE).json(src).count()

        t0 = time.perf_counter()
        stream = jobs.file_bronze_stream(spark, src)
        candles = jobs.ohlc_candles(silver.btc_prices(stream), ts_col="price_timestamp")
        q = (
            candles.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        return {"events": n, "sec": round(dt, 3), "events_per_sec": round(n / dt)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Fixed CPU+shuffle control job, measured once per suite pass.  The
# baseline constant is its best reading in a healthy window on this box
# (recorded round 5; re-pin if the hardware changes).  control_ratio =
# min(measured)/baseline normalizes every recorded number for the
# machine's contention waves: a suite recorded at control_ratio 1.8
# ran on a box 1.8x slower than the healthy baseline, same code.
CONTROL_BASELINE_SEC = 0.65


def _round_guess(here: str) -> int | None:
    """Current build round, inferred from the driver's recorded
    BENCH_r{N}.json artifacts (this run's own record lands after it, so
    the round in flight is max(existing) + 1; None before round 1)."""
    import glob
    import re

    ns = [
        int(m.group(1))
        for f in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))
    ]
    return max(ns) + 1 if ns else None


def _quiet(spark) -> None:
    """Bench sessions run at ERROR log level: the provably-bounded
    unpartitioned windows (a30/a31/a32/pk/sh — documented and
    plan-guarded) each emit a WindowExec warning, and the flood was
    eating most of the driver's bounded stdout/stderr tail capture
    (VERDICT r07 "what's wrong" #2). Scoped to bench only — tests and
    interactive sessions keep default logging."""
    spark.sparkContext.setLogLevel("ERROR")


def _control_probe(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr(
        "sum(id * 2654435761 % 1000003)"
    ).collect()
    spark.range(8_000_000).groupBy((F.col("id") % 4096).alias("k")).count().where(
        "count < 0"
    ).count()
    return time.perf_counter() - t0


def streaming_dedup_throughput(spark, sf_dir: str, batches: int = 5) -> dict:
    """Standing incremental-dedup job throughput: documents stream in
    ``batches`` micro-batches through the full exactness-preserving funnel
    (new-batch signatures -> persistent-index bucket probes -> band-count /
    estimate / exact-verify) with the index extended (parquet write) per
    batch. docs/s here is the per-batch cost a continuous corpus-ingest
    pipeline would pay, index maintenance included."""
    import shutil
    import tempfile

    from kafka_streaming_polymarket_pipeline_spark.streaming import dedup_stream
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    tmp = tempfile.mkdtemp(prefix="bench_sdedup_")
    try:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        n = docs.count()
        src = os.path.join(tmp, "in")
        docs.repartition(batches * 2).write.parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = dedup_stream.incremental_dedup_sink(
            stream,
            os.path.join(tmp, "idx"),
            os.path.join(tmp, "pairs"),
            os.path.join(tmp, "ck"),
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        return {"docs": n, "batches": batches, "sec": round(dt, 3), "docs_per_sec": round(n / dt)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from kafka_streaming_polymarket_pipeline_spark import plans
    from kafka_streaming_polymarket_pipeline_spark.session import get_spark

    if "--streaming-dedup-only" in sys.argv:
        # Fresh-process mode, same rationale as --streaming-only. Warm with
        # a sf0.01-size run if available, then best-of-N at the target SF
        # (contention-waves protocol).
        spark = get_spark(app_name="pmps-bench-sdedup", cpus=cpus, shuffle_partitions=cpus)
        _quiet(spark)
        warm_dir = "/root/testdata/sf0.01"
        streaming_dedup_throughput(spark, warm_dir if os.path.isdir(warm_dir) else sf_dir)
        runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
        best = None
        all_runs = []
        controls: list[float] = []
        for _ in range(max(runs, 1)):
            # adjacent control probe per pass (r08 verdict #1: the
            # streaming tiers were the last bench lines without one, so
            # a contention-wave outlier pass had nothing in the artifact
            # to attribute it)
            controls.append(_control_probe(spark))
            r = streaming_dedup_throughput(spark, sf_dir)
            all_runs.append(r["docs_per_sec"])
            if best is None or r["docs_per_sec"] > best["docs_per_sec"]:
                best = r
        controls.append(_control_probe(spark))
        # chronological per-run readings (heavy-tier self-attribution
        # rule): r08's official 55 docs/s sat against a clean-window 106
        # — with this field that gap is visible inside the artifact.
        best["all_runs_docs_per_sec"] = all_runs
        best["control_secs"] = [round(c, 3) for c in controls]
        best["control_ratios"] = [
            round(c / CONTROL_BASELINE_SEC, 2) for c in controls
        ]
        best["control_layout"] = (
            "control i ran before pass i; final control after the last pass"
        )
        print(json.dumps(best))
        return

    if "--streaming-only" in sys.argv:
        # Subprocess mode: fresh JVM; warm one small batch (every micro-batch
        # after a streaming job's first is warm — steady state is the honest
        # number), then measure best-of-N, printing one JSON line. Best-of-N
        # for the same reason as the batch min-of-N: this box's background
        # load comes in waves (round-2 recorded 21.5k events/s in a
        # contention window vs 200-250k healthy, same code).
        spark = get_spark(app_name="pmps-bench-stream", cpus=cpus, shuffle_partitions=cpus)
        _quiet(spark)
        streaming_throughput(spark, sf_dir, n_rows=100_000)
        # Best-of-3 (one more than the batch default): the streaming number
        # is the headline baseline comparison and this box's contention
        # waves can span a whole 2-run window.
        runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
        best = None
        all_runs: list[int] = []
        controls: list[float] = []
        for _ in range(max(runs, 1)):
            # adjacent control probe per pass (r08 verdict #1: the
            # 16,683 events/s pass sat 20x off trend with nothing in
            # the artifact to attribute it — per-pass ratios make an
            # outlier pass self-explaining like the headline/heavy
            # tiers)
            controls.append(_control_probe(spark))
            r = streaming_throughput(spark, sf_dir)
            all_runs.append(r["events_per_sec"])
            if best is None or r["events_per_sec"] > best["events_per_sec"]:
                best = r
        controls.append(_control_probe(spark))
        # every pass's reading, best-first not — chronological: a
        # contention-wave outlier window is visible in the artifact
        # instead of silently shaping the official best (the heavy-tier
        # self-attribution rule applied to the streaming phases).
        best["all_runs_events_per_sec"] = all_runs
        best["control_secs"] = [round(c, 3) for c in controls]
        best["control_ratios"] = [
            round(c / CONTROL_BASELINE_SEC, 2) for c in controls
        ]
        best["control_layout"] = (
            "control i ran before pass i; final control after the last pass"
        )
        print(json.dumps(best))
        return

    spark = get_spark(app_name="pmps-bench", cpus=cpus, shuffle_partitions=cpus)
    _quiet(spark)

    # Warm the JVM/codegen paths so per-query numbers reflect steady state,
    # not first-action classloading (a cluster amortizes this once per job).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    registry = plans.all_queries()
    names = list(registry) if os.environ.get("SPARK_GRAFT_BENCH_ALL") else [
        n for n in HEADLINE if n in registry
    ]

    # Min over N FULL PASSES of the suite (not N consecutive runs per
    # query): this box's background load comes in waves that can span a
    # whole back-to-back repeat window (SCALE.md "machine drift" — same
    # code varies 1-10x between windows), so a query's repeats must be
    # SEPARATED in time. Pass k's run of query q is minutes away from
    # pass k+1's run of q — two genuinely different windows — and
    # min-over-repetitions is the standard estimator for noise-free time
    # under additive interference (hyperfine's `min`). Cache is cleared
    # between runs so repeats re-execute the full pipeline; only
    # JVM/codegen warmth carries over, which the warmup grants pass 1.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    min_pass: dict[str, int] = {}  # which suite pass produced each query's min
    flaky: dict[str, int] = {}  # name -> pass idx of a failure AFTER a success
    control_secs: list[float] = []
    for _pass in range(max(runs, 1)):
        control_secs.append(_control_probe(spark))
        for name in names:
            if timings.get(name, 0.0) < 0:
                continue  # failed in an earlier pass, never succeeded
            builder = registry[name]
            t0 = time.perf_counter()
            try:
                df = builder(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # keep going; don't clobber a prior success
                print(f"bench: {name} FAILED (pass {_pass}): {exc}", file=sys.stderr)
                if timings.get(name, -1.0) > 0:
                    flaky[name] = _pass  # succeeded earlier: keep the valid timing
                else:
                    timings[name] = -1.0  # never succeeded: negative sentinel
                spark.catalog.clearCache()  # failed builder may have persisted stages
                continue
            dt = time.perf_counter() - t0
            prev = timings.get(name)
            if prev is None or dt < prev:
                timings[name] = dt
                min_pass[name] = _pass
            spark.catalog.clearCache()  # drop per-query persisted stages (e.g. LSH sigs)
    control_secs.append(_control_probe(spark))

    # Heavy tier: the expensive operators get their own loop AFTER the
    # headline passes (so their tens-of-seconds runs don't sit between a
    # fast query's repeats). Min-of-2 by default and bracketed by its OWN
    # control probes (heavy_control_secs — one before each pass, one
    # after the last), so a contention-wave outlier pass is visibly
    # attributed instead of landing as the official trend number
    # (VERDICT r07 #1: min-of-1 recorded d12 at 2.5x its trend).
    # control_secs itself stays headline-only (r07 ADVICE: the old
    # post-heavy append broke its documented layout). Skipped under
    # BENCH_ALL (the full registry already includes them).
    heavy: dict[str, float] = {}
    heavy_control_secs: list[float] = []
    heavy_min_pass: dict[str, int] = {}
    heavy_runs = int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_RUNS", "2"))
    if not os.environ.get("SPARK_GRAFT_BENCH_ALL"):
        for _pass in range(max(heavy_runs, 1)):
            heavy_control_secs.append(_control_probe(spark))
            for name in HEAVY:
                if name not in registry or heavy.get(name, 0.0) < 0:
                    continue
                t0 = time.perf_counter()
                try:
                    registry[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as exc:
                    print(f"bench: {name} FAILED (heavy): {exc}", file=sys.stderr)
                    heavy.setdefault(name, -1.0)
                    spark.catalog.clearCache()
                    continue
                dt = time.perf_counter() - t0
                if name not in heavy or dt < heavy[name]:
                    heavy[name] = dt
                    heavy_min_pass[name] = _pass
                spark.catalog.clearCache()
        heavy_control_secs.append(_control_probe(spark))

    # Streaming throughput runs in its own fresh *process* (a streaming job
    # is its own long-lived app in production; measuring it inside the JVM
    # that just ran 22 batch plans — codegen cache churn, old-gen pressure —
    # understates it ~8x, and spark.stop() doesn't give a clean JVM because
    # the py4j gateway persists).
    spark.stop()
    def _subproc(flag: str):
        import subprocess

        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": str(cpus)},
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    try:
        stream = _subproc("--streaming-only")
    except Exception as exc:
        print(f"bench: streaming throughput FAILED: {exc}", file=sys.stderr)
        stream = None
    try:
        stream_dedup = _subproc("--streaming-dedup-only")
    except Exception as exc:
        print(f"bench: streaming dedup throughput FAILED: {exc}", file=sys.stderr)
        stream_dedup = None

    # sf from the dir name (e.g. .../sf0.1 -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = None

    detail, line = build_output(
        timings, heavy, stream, stream_dedup, sf, cpus, runs,
        control_secs, min_pass, flaky,
        heavy_control_secs=heavy_control_secs,
        heavy_min_pass=heavy_min_pass,
        heavy_runs=heavy_runs,
    )
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(
        here,
        "BENCH_ALL.json" if os.environ.get("SPARK_GRAFT_BENCH_ALL") else DETAIL_FILE,
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"bench: full payload written to {detail_path}", file=sys.stderr)
    # Round-suffixed copy: BENCH_DETAIL.json is overwritten every round,
    # so per-query trend history would only survive in the driver's
    # bounded tail capture (r06's detail is gone for exactly this
    # reason — VERDICT r07 task 6). The round is inferred from the
    # driver's own artifacts: it records BENCH_r{N}.json after this run,
    # so the current round is max(existing N) + 1.
    # BENCH_ALL sweeps write their own artifact name: an ad-hoc
    # all-query run must never clobber the round's headline-format
    # detail (it did once — restored from git).
    rnd = _round_guess(here)
    if rnd is not None:
        prefix = "BENCH_ALL" if os.environ.get("SPARK_GRAFT_BENCH_ALL") else "BENCH_DETAIL"
        versioned = os.path.join(here, f"{prefix}_r{rnd:02d}.json")
        with open(versioned, "w") as f:
            json.dump(detail, f, indent=1)
        print(f"bench: round-suffixed payload written to {versioned}", file=sys.stderr)
    # The driver parses the LAST stdout line from a bounded tail capture:
    # this must be the only/final stdout line, and stay short (tested).
    print(line)


if __name__ == "__main__":
    main()
