"""Streaming corpus quality gate: the t16 hashed-feature classifier and
t17 char-entropy filter applied to a document stream, with a keep /
quarantine split.

Both feature sets are stateless row-local expressions, so the SAME plan
runs over a batch frame or a readStream frame — no watermark, no state
store, and the streaming micro-batch output is bit-identical to the
batch run over the same files (asserted in
tests/test_streaming_quality.py). This is the online admission filter a
continuously-ingesting training-data pipeline runs in front of the
dedup index: reject gibberish/low-quality documents BEFORE they cost
signature computation and index writes.

At scale: map-only inside whole-stage codegen; throughput is bounded by
source read bandwidth, and the split writes are two append-only sinks
(no rewrite amplification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import text as T

ENTROPY_MIN_BITS = 2.0  # below ~2 bits/char is repetitive junk / binary


def quality_features_frame(docs: DataFrame, entropy_min: float = ENTROPY_MIN_BITS) -> DataFrame:
    """Attach classifier + entropy features and the admission flag.

    Works identically on batch and streaming frames (stateless). The keep
    rule is the conjunction the papers use independently: classifier
    logit >= 0 (fastText-style quality, Joulin et al. 2016) AND character
    entropy above the gibberish floor (low-entropy filter).
    """
    clf = T.quality_classifier_features(F.col("text"))
    logit = F.round(clf["quality_logit"], 6)
    entropy = F.round(F.col("char_entropy_bits"), 6) + F.lit(0.0)
    return T.char_entropy_frame(docs).select(
        "doc_id",
        "lang",
        "source",
        logit.alias("quality_logit"),
        entropy.alias("char_entropy_bits"),
        ((logit >= 0) & (entropy >= entropy_min)).alias("keep"),
    )


def quality_split(
    docs: DataFrame, entropy_min: float = ENTROPY_MIN_BITS
) -> tuple[DataFrame, DataFrame]:
    """(kept, quarantined) frames — both derived from one feature plan so
    a row lands in exactly one sink."""
    feats = quality_features_frame(docs, entropy_min)
    return feats.filter(F.col("keep")), feats.filter(~F.col("keep"))


def _bin_expr(value_col: str, mn: float, mx: float, n_bins: int) -> F.Column:
    """The ONE bin-assignment expression both the reference histogram
    and the live monitor must share (mismatched binning makes the
    comparison meaningless): clamped-floor over the reference window's
    frozen [mn, mx]. Unlike batch a31 (where mn/mx are the global
    min/max so only the top edge can clip), a live stream drifts BELOW
    mn too — both edges clamp, so outliers fold into the edge bins and
    per-window state stays <= n_bins no matter how far the stream
    drifts (the unclamped form would mint one pseudo-bin per outlier
    stride, unbounding the (window, bin) state store exactly in the
    scenario the monitor exists to catch)."""
    return F.greatest(
        F.least(
            F.floor((F.col(value_col) - F.lit(mn)) * n_bins / F.lit(mx - mn)),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    ).cast("int")


def reference_histogram(
    df: DataFrame,
    value_col: str = "value",
    mn: float | None = None,
    mx: float | None = None,
    n_bins: int = 10,
) -> tuple[DataFrame, float, float]:
    """Build the static reference histogram a drift monitor compares
    against: (bin, ref_share) over ``n_bins`` fixed bins. Returns the
    (mn, mx) binning range too — the REFERENCE WINDOW defines the bin
    edges (a stream cannot know a global min/max), and the live monitor
    must bin with the same constants or the comparison is meaningless.
    A degenerate range (mx <= mn, e.g. a stuck constant-valued
    reference) raises instead of silently folding everything into one
    bin and reporting near-zero PSI forever."""
    if mn is None or mx is None:
        row = df.agg(F.min(value_col).alias("mn"), F.max(value_col).alias("mx")).collect()[0]
        mn = float(row["mn"]) if mn is None else mn
        mx = float(row["mx"]) if mx is None else mx
    if mx <= mn:
        raise ValueError(
            f"degenerate binning range [{mn}, {mx}]: the reference window is "
            "constant-valued; widen the window or pass explicit mn/mx"
        )
    binned = df.select(_bin_expr(value_col, mn, mx, n_bins).alias("bin"))
    counts = binned.groupBy("bin").count()
    total = counts.agg(F.sum("count").cast("double").alias("t"))
    hist = counts.crossJoin(F.broadcast(total)).select(
        "bin", (F.col("count") / F.col("t")).alias("ref_share")
    )
    return hist, mn, mx


def stream_drift_monitor(
    events: DataFrame,
    reference: DataFrame,
    mn: float,
    mx: float,
    ts_col: str = "ts",
    value_col: str = "value",
    every: str = "15 minutes",
    watermark: str = "2 minutes",
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Streaming drift monitor — a31's PSI, a32's binned KS and a33's
    binned Wasserstein-1 as ONE standing job: per event-time window of
    the live stream, one emission (window_start, window_end, n_events,
    psi, ks_stat, w1_distance) against the static ``reference``
    histogram (from ``reference_histogram``, which also fixes the
    binning constants). The three statistics share the frozen binning,
    the (window, bin) count state, and the per-window roll-up, so
    monitoring all of them costs exactly one binning pass — the same
    economy the batch triple gets from its shared 10-bin discretization
    (plans/survey_ops.py a31/a32/a33). KS/W1 here are the
    window-vs-reference form (live sample against the reference
    sample's CDF over the same bins); the batch forms compare two
    slices — same statistics, different populations, documented.

    Plan shape: the reference is <= n_bins rows BY CONSTRUCTION, so it
    folds into the plan as literal per-bin shares (driver-side collect
    of a bounded frame, the sanctioned class) — no stream-static join
    at all. Binning is the SAME clamped-floor expression as batch a31
    with the same constants -> identical bins. One watermarked
    (window, bin) count agg, then a per-window roll-up (a <= n_bins
    bin->count map) — two chained stateful aggs in append mode, the
    Spark-4 pattern stream_asof_join uses. All three statistics then
    come from ONE F.aggregate over the literal bin sequence
    0..n_bins-1, so reference bins ABSENT from the window contribute
    exactly their drift mass (vanished-bin PSI terms; CDF jumps for
    KS/W1) and bins in NEITHER population carry the persisted CDF gap
    into W1 and exactly 0.0 into PSI/KS."""
    if mx <= mn:
        raise ValueError(f"degenerate binning range [{mn}, {mx}]")
    ref_rows = {int(r["bin"]): float(r["ref_share"]) for r in reference.collect()}

    binned = events.withWatermark(ts_col, watermark).select(
        F.col(ts_col),
        _bin_expr(value_col, mn, mx, n_bins).alias("bin"),
    )
    counts = binned.groupBy(F.window(ts_col, every).alias("w"), "bin").count()
    rolled = counts.groupBy("w").agg(
        F.sum("count").alias("n_events"),
        F.map_from_entries(
            F.collect_list(F.struct("bin", "count"))
        ).alias("cmap"),  # <= n_bins entries
    )
    stats = _psi_ks_expr(F.col("cmap"), F.col("n_events"), ref_rows, n_bins, eps)
    return rolled.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
        F.round(stats["psi"], 6).alias("psi"),
        F.round(stats["mx"], 6).alias("ks_stat"),
        F.round(stats["w1"] * F.lit((mx - mn) / n_bins), 6).alias("w1_distance"),
    )


def _psi_ks_expr(cmap: F.Column, n_events: F.Column, ref_rows: dict, n_bins: int, eps: float):
    """One fold over the fixed bin order 0..n_bins-1 computing PSI, the
    KS running max |CDF_live − CDF_ref|, and the unscaled Wasserstein-1
    sum Σ|CDF_live − CDF_ref| (callers multiply by their bin width)
    together; accumulator is (cum_p, cum_q, ks_max, psi, w1). Shared by
    the streaming per-window monitor and the batch/foreachBatch form so
    the forms can never disagree on the math. ``cmap`` is the
    bin->count map, ``n_events`` its total; reference bins absent from
    the live side contribute their PSI terms and CDF jumps, bins in
    neither carry the persisted CDF gap into W1 (and exactly 0.0 into
    PSI/KS) — the fold covers every bin, so no occupied-bin spine is
    needed."""
    ref_arr = F.array(*[F.lit(float(ref_rows.get(b, 0.0))) for b in range(n_bins)])
    acc0 = F.struct(
        F.lit(0.0).alias("cp"), F.lit(0.0).alias("cq"),
        F.lit(0.0).alias("mx"), F.lit(0.0).alias("psi"),
        F.lit(0.0).alias("w1"),
    )

    def step(acc, b):
        p = F.coalesce(cmap[b], F.lit(0)).cast("double") / n_events
        q = F.get(ref_arr, b)
        cp, cq = acc["cp"] + p, acc["cq"] + q
        pe, qe = p + F.lit(eps), q + F.lit(eps)
        return F.struct(
            cp.alias("cp"),
            cq.alias("cq"),
            F.greatest(acc["mx"], F.abs(cp - cq)).alias("mx"),
            (acc["psi"] + (pe - qe) * F.log(pe / qe)).alias("psi"),
            (acc["w1"] + F.abs(cp - cq)).alias("w1"),
        )

    return F.aggregate(F.sequence(F.lit(0), F.lit(n_bins - 1)), acc0, step)


def _drift_stats_from_rows(
    df: DataFrame,
    ref_rows: dict,
    mn: float,
    mx: float,
    value_col: str = "value",
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Batch form of the drift monitor over a pre-collected reference:
    ONE (n_events, psi, ks_stat, w1_distance) row — the full triple
    from the one shared fold — for a static frame (empty input -> zero
    rows, not a null reading). The foreachBatch building block — a
    micro-batch IS the window, so no event-time machinery."""
    if mx <= mn:
        raise ValueError(f"degenerate binning range [{mn}, {mx}]")
    binned = df.select(_bin_expr(value_col, mn, mx, n_bins).alias("bin"))
    rolled = binned.groupBy("bin").count().agg(
        F.sum("count").alias("n_events"),
        F.map_from_entries(F.collect_list(F.struct("bin", "count"))).alias("cmap"),
    )
    stats = _psi_ks_expr(F.col("cmap"), F.col("n_events"), ref_rows, n_bins, eps)
    return rolled.select(
        "n_events",
        F.round(stats["psi"], 6).alias("psi"),
        F.round(stats["mx"], 6).alias("ks_stat"),
        F.round(stats["w1"] * F.lit((mx - mn) / n_bins), 6).alias("w1_distance"),
    ).filter(F.col("n_events") > 0)


def drift_stats(
    df: DataFrame,
    reference: DataFrame,
    mn: float,
    mx: float,
    value_col: str = "value",
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """One (n_events, psi, ks_stat, w1_distance) row for a static frame
    against the frozen ``reference`` histogram — ``stream_drift_monitor``'s math
    (same `_psi_ks_expr` fold, same clamped binning) without the
    event-time window, for batch audits and foreachBatch monitors."""
    ref_rows = {int(r["bin"]): float(r["ref_share"]) for r in reference.collect()}
    return _drift_stats_from_rows(df, ref_rows, mn, mx, value_col, n_bins, eps)


def stream_psi_drift(
    events: DataFrame,
    reference: DataFrame,
    mn: float,
    mx: float,
    ts_col: str = "ts",
    value_col: str = "value",
    every: str = "15 minutes",
    watermark: str = "2 minutes",
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI-only view of :func:`stream_drift_monitor` (original r07 API;
    the KS twin folded in per VERDICT r07 task 4 — same plan, same
    state, one more output column that this projection drops)."""
    return stream_drift_monitor(
        events, reference, mn, mx, ts_col, value_col, every, watermark, n_bins, eps
    ).drop("ks_stat", "w1_distance")


def stream_ks_drift(
    events: DataFrame,
    reference: DataFrame,
    mn: float,
    mx: float,
    ts_col: str = "ts",
    value_col: str = "value",
    every: str = "15 minutes",
    watermark: str = "2 minutes",
    n_bins: int = 10,
) -> DataFrame:
    """KS-only view of :func:`stream_drift_monitor` — binned two-sample
    KS per window against the frozen reference (a32's statistic in
    streaming form)."""
    return stream_drift_monitor(
        events, reference, mn, mx, ts_col, value_col, every, watermark, n_bins
    ).drop("psi", "w1_distance")
