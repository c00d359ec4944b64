"""Bucketized interval (range) join — the scale path for J2.

A plain range join (`fact.ts BETWEEN dim.start AND dim.end`) has no equi-key,
so Spark falls back to BroadcastNestedLoopJoin: O(|facts| x |intervals|)
comparisons, and only viable while the interval side broadcasts. For large
interval sets (a year of 15-minute markets is 35k rows; multi-asset, millions)
the standard fix is time bucketing:

1. every fact row gets an equi-key `_bk = floor(ts / W)`;
2. every interval explodes into the buckets it overlaps
   (`sequence(floor(start/W), floor((end - 1us)/W))` — intervals are
   [start, end), so an end on a bucket boundary does not spill over);
3. equi-join on `_bk` (shuffle-hash/sort-merge — partition-parallel,
   AQE-skew-splittable), then the exact range predicate refines.

Each (fact, interval) pair can meet in at most one bucket (the fact's), so
the join introduces no duplicates. Interval-side blowup is
len(interval)/W + 1 rows — pick W on the order of the typical interval
length (15-minute markets -> 15-minute buckets => ~2 rows per interval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def bucketed_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 900,
    how: str = "inner",
) -> DataFrame:
    """Join facts to [start, end) intervals via time-bucket equi-keys.

    Output columns = facts' + intervals' (minus the internal bucket key).
    """
    w_us = bucket_seconds * _US
    f = facts.withColumn("_bk", F.floor(F.unix_micros(F.col(ts_col)) / w_us))
    iv = intervals.withColumn(
        "_bks",
        F.sequence(
            F.floor(F.unix_micros(F.col(start_col)) / w_us),
            F.floor((F.unix_micros(F.col(end_col)) - 1) / w_us),
        ),
    ).withColumn("_bk", F.explode("_bks")).drop("_bks")
    return (
        f.join(iv, "_bk", how)
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bk")
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    ts_col: str,
    build_cols: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each probe row picks up the build row with the greatest
    ``ts_col`` <= the probe's (``direction='backward'``, the default) or
    the smallest ``ts_col`` >= the probe's (``direction='forward'``)
    within the same ``on`` key (equal timestamps match either way —
    kdb/pandas ``merge_asof`` semantics).

    Implementation is the union-marker scan, not a range join: tag build
    rows 0 and probe rows 1, sort each key partition by (ts, marker), and
    propagate the last non-null build payload with an unbounded-preceding
    ``last(ignorenulls)`` window. One shuffle on the key, no interval
    explosion, no BroadcastNestedLoopJoin — the plan is a single
    sort-partial per key partition regardless of how far back the match
    lies, which is what makes it the 100 TB form (a bucketed interval join
    must pick a max-staleness horizon; this form has none).

    ``build`` must be unique per (key, ts) — ambiguous same-instant build
    rows have no defined winner in any as-of engine; callers dedupe first
    (see j6's row_number guard). ``how='left'`` keeps unmatched probe rows
    with null build columns; ``'inner'`` drops them.

    Mirrors the reference's latest-price lookup against the most recent
    book snapshot (reference consumers/db_writer.py upsert-latest pattern),
    generalized to any (key, time) pair of tables.
    """
    from pyspark.sql import Window

    reserved = {"_k", "_ts", "_m", "_b", "_match"}
    clash = reserved & (set(probe.columns) | set(build.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(reserved)}; "
            f"rename input columns {sorted(clash)} first"
        )
    overlap = set(build_cols) & set(probe.columns)
    if overlap:
        raise ValueError(
            f"build_cols {sorted(overlap)} collide with probe columns; "
            "alias them on the build side before the join"
        )

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    # Marker ordering puts the build row on the MATCHING side of the
    # probe at equal timestamps: backward scans [start, current] with
    # build (0) before probe (1); forward scans [current, end] with
    # probe (0) before build (1) — so exact-ts builds match in both.
    bm, pm = (0, 1) if direction == "backward" else (1, 0)
    payload = F.struct(*[F.col(c) for c in build_cols])
    b = build.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(bm).alias("_m"),
        payload.alias("_b"),
    )
    probe_cols = probe.columns
    p = probe.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(pm).alias("_m"),
        F.lit(None).cast(b.schema["_b"].dataType).alias("_b"),
        *[F.col(c) for c in probe_cols],
    )
    base = Window.partitionBy("_k").orderBy("_ts", "_m")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("_b", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("_b", ignorenulls=True).over(w)
    joined = (
        b.unionByName(p, allowMissingColumns=True)
        .withColumn("_match", pick)
        .filter(F.col("_m") == F.lit(pm))
    )
    if how == "inner":
        joined = joined.filter(F.col("_match").isNotNull())
    return joined.select(
        *[F.col(c) for c in probe_cols],
        *[F.col("_match")[c].alias(c) for c in build_cols],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    extra_keys: list[str] | None = None,
    min_overlap_us: int = 0,
) -> DataFrame:
    """Interval-OVERLAP join: all (left, right) pairs whose [start, end)
    intervals intersect (strict: ``l.start < r.end AND r.start < l.end``),
    optionally within the same ``extra_keys`` — WITHOUT a nested-loop
    plan. This is the two-sided generalization of the point-in-interval
    ``bucketed_interval_join`` (J2): span-conflict detection, co-activity
    windows, meeting/booking overlap — the reference's point lookups
    never need it, but any calendar/interval analytics layer does.

    Both sides explode into the time buckets they cover; qualifying
    pairs meet in every SHARED bucket, so the join dedups with the
    standard later-start rule: a pair is emitted only in the bucket
    containing ``greatest(l.start, r.start)`` — overlap guarantees the
    later start lies inside BOTH intervals' bucket ranges, and exactly
    one bucket contains it, so the output is duplicate-free with no
    ``distinct()`` shuffle. The equi-join key is (extra_keys..., bucket):
    shuffle-partitioned, AQE-skew-splittable; per-side blowup is
    len/W + 1 rows like the J2 form.

    Column conventions follow band_join: left columns keep their names,
    right columns get an ``r_`` prefix; callers compute overlap measures
    from the raw integer-µs bounds (exact, no rounding contract).

    ``min_overlap_us`` is the 100 TB pre-prune: the raw pair set is
    output-bound on co-active corpora (~16M pairs at sf0.1 — SCALE.md),
    and most of that mass is grazing overlaps nobody asks for. A
    positive value keeps only pairs overlapping for at least that many
    microseconds — ``least(ends) - greatest(starts) >= min_overlap_us``,
    exact integer-µs arithmetic — applied in the join's residual filter,
    so pruned pairs die inside the bucket join before any downstream
    shuffle or ranking sees them. 0 (default) preserves the strict
    any-overlap semantics exactly.
    """
    w_us = bucket_seconds * _US
    keys = list(extra_keys or [])

    def bucketed(df: DataFrame, prefix: str = "") -> DataFrame:
        s, e = F.unix_micros(F.col(start_col)), F.unix_micros(F.col(end_col))
        # [start, end) semantics: empty intervals (end <= start) overlap
        # nothing and are dropped — also keeps the bucket sequence() from
        # silently generating a DESCENDING range on a boundary-aligned
        # empty interval.
        out = df.filter(e > s).select(
            *[F.col(c).alias(f"{prefix}{c}" if c not in keys else c) for c in df.columns],
            F.explode(F.sequence(F.floor(s / w_us), F.floor((e - 1) / w_us))).alias("_bk"),
        )
        return out

    l = bucketed(left)
    r = bucketed(right, "r_")
    ls, le = F.col(start_col), F.col(end_col)
    rs, re_ = F.col(f"r_{start_col}"), F.col(f"r_{end_col}")
    later_start = F.greatest(F.unix_micros(ls), F.unix_micros(rs))
    out = (
        l.join(r, [*keys, "_bk"])
        .filter((ls < re_) & (rs < le))
        .filter(F.col("_bk") == F.floor(later_start / w_us))  # meet-once rule
    )
    if min_overlap_us > 0:
        earlier_end = F.least(F.unix_micros(le), F.unix_micros(re_))
        out = out.filter(earlier_end - later_start >= F.lit(min_overlap_us))
    return out.drop("_bk")


def band_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    value_col: str,
    eps: float,
    round_dp: int = 6,
) -> DataFrame:
    """Numeric band (tolerance) join: pairs with |probe.value - build.value|
    <= eps within the same ``on`` key, WITHOUT a nested-loop plan.

    Standard epsilon-bucketing: both sides get an integer bucket
    floor(value / eps); the probe side explodes to its bucket and both
    neighbors, so every qualifying pair meets in exactly one bucket (the
    build row's — a build bucket appears once in the probe's 3-bucket
    neighborhood, never twice), making the join an equi-join on
    (key, bucket) with a 3x probe blow-up — shuffle-partitioned and
    AQE-splittable where the naive range predicate would plan a
    BroadcastNestedLoopJoin. The residual |diff| <= eps filter uses the
    RAW difference: it is a single subtract+abs over identical source
    doubles, so both engines compute the identical IEEE value and the
    band edge cannot flip — and raw is also what the 3-bucket coverage
    proof needs (diff <= eps => at most one bucket apart; a ROUNDED
    predicate would admit diff slightly above eps, which can sit two
    buckets away and silently vanish from the bucketed plan).

    Column conventions: probe columns keep their names, build columns get
    a ``b_`` prefix; both value columns and the diff are returned rounded.
    """
    pb = F.floor(F.col(value_col) / F.lit(eps)).cast("long")
    p = probe.withColumn(
        "_bk", F.explode(F.array(pb - 1, pb, pb + 1))
    )
    b = build.select(
        F.col(on),
        F.floor(F.col(value_col) / F.lit(eps)).cast("long").alias("_bk"),
        *[F.col(c).alias(f"b_{c}") for c in build.columns if c != on],
    )
    raw_diff = F.abs(F.col(value_col) - F.col(f"b_{value_col}"))
    return (
        p.join(b, [on, "_bk"])
        .filter(raw_diff <= F.lit(eps))
        .drop("_bk")
        .withColumn("value_diff", F.round(raw_diff, round_dp))
    )


def asof_interpolate(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    ts_col: str,
    value_col: str,
    out_col: str = "interp_value",
    build_ts_col: str | None = None,
) -> DataFrame:
    """As-of join with LINEAR INTERPOLATION: each probe row gets the
    build series' value AT its timestamp — v0 + (v1 - v0) * (t - t0) /
    (t1 - t0) between the latest build row at-or-before (t0, v0) and the
    earliest STRICTLY-after (t1, v1). The natural completion of the
    as-of family (j6 backward / j8 forward / j9 nearest): those pick a
    side, this reconstructs the value between sides — pandas
    ``Series.interpolate``'s time method as a join, the standard
    "price at event time" estimator for irregular series.

    Edges: exact-timestamp build match lands on the BACKWARD side (t0 =
    t, fraction 0 → exactly v0, no float edge); probe before the first
    build row extrapolates flat from v1; after the last, flat from v0;
    no build rows at all → NULL. t0 <= t < t1 guarantees the divisor is
    positive — never zero.

    ONE shuffle for BOTH directions: unlike composing two
    :func:`asof_join` calls (two union-marker scans, two shuffles),
    this tags and sorts once and runs the backward last(ignorenulls)
    and forward first(ignorenulls) windows over the SAME (key, ts,
    marker) sort — the marker convention (build 0 before probe 1 at
    equal ts) is what makes backward inclusive and forward strict
    simultaneously. ``build`` must be unique per (key, ts); callers
    dedupe first (j6's convention). Output value rounds to 6 dp with
    the division parenthesized identically in the oracle.
    ``build_ts_col`` names the build side's timestamp when it differs
    from the probe's (w9 probes a grid_ts against a raw ts series).
    """
    from pyspark.sql import Window

    reserved = {"_k", "_ts", "_m", "_b", "_p", "_n"}
    clash = reserved & (set(probe.columns) | set(build.columns))
    if clash:
        raise ValueError(
            f"asof_interpolate reserves internal column names "
            f"{sorted(reserved)}; rename input columns {sorted(clash)} first"
        )
    bts = build_ts_col or ts_col
    b = build.select(
        F.col(on).alias("_k"),
        F.col(bts).alias("_ts"),
        F.lit(0).alias("_m"),
        F.struct(
            F.unix_micros(F.col(bts)).alias("t"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("_b"),
    )
    probe_cols = probe.columns
    p = probe.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_m"),
        F.lit(None).cast(b.schema["_b"].dataType).alias("_b"),
        *[F.col(c) for c in probe_cols],
    )
    base = Window.partitionBy("_k").orderBy("_ts", "_m")
    prev = F.last("_b", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.first("_b", ignorenulls=True).over(
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.unix_micros(F.col("_ts"))
    t0, v0 = F.col("_p.t"), F.col("_p.v")
    t1, v1 = F.col("_n.t"), F.col("_n.v")
    interp = (
        F.when(F.col("_p").isNull() & F.col("_n").isNull(), F.lit(None))
        .when(F.col("_p").isNull(), v1)
        .when(F.col("_n").isNull(), v0)
        .otherwise(
            v0
            + (v1 - v0)
            * ((t - t0).cast("double") / (t1 - t0).cast("double"))
        )
    )
    return (
        b.unionByName(p, allowMissingColumns=True)
        .withColumn("_p", prev)
        .withColumn("_n", nxt)
        .filter(F.col("_m") == 1)
        .select(
            *[F.col(c) for c in probe_cols],
            F.round(interp, 6).alias(out_col),
        )
    )
