"""Streaming quality gate: the stateless classifier/entropy plan must
produce BIT-IDENTICAL output over a readStream micro-batch drain and a
plain batch read of the same files, and the keep/quarantine split must
partition the corpus exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as ST

from kafka_streaming_polymarket_pipeline_spark.streaming import jobs
from kafka_streaming_polymarket_pipeline_spark.streaming import quality_stream as QS

DOC_SCHEMA = ST.StructType(
    [
        ST.StructField("doc_id", ST.LongType()),
        ST.StructField("text", ST.StringType()),
        ST.StructField("lang", ST.StringType()),
        ST.StructField("source", ST.StringType()),
        ST.StructField("n_chars", ST.LongType()),
    ]
)

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank", "en", "web", 63),
    (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "en", "web", 32),  # low entropy -> quarantine
    (2, "el rapido zorro marron salta sobre el perro perezoso hoy mismo", "es", "web", 62),
    (3, "xxxxxyyyyyxxxxxyyyyyxxxxxyyyyy", "en", "spam", 30),  # 1 bit/char -> quarantine
    (4, "streaming quality gates reject gibberish before dedup costs start", "en", "docs", 65),
]


def _write_src(spark, path):
    df = spark.createDataFrame(ROWS, DOC_SCHEMA)
    df.coalesce(1).write.parquet(str(path))


def test_stream_equals_batch_and_split_partitions(spark, tmp_path):
    src = tmp_path / "docs"
    _write_src(spark, src)

    batch = QS.quality_features_frame(spark.read.schema(DOC_SCHEMA).parquet(str(src)))
    stream_in = spark.readStream.schema(DOC_SCHEMA).parquet(str(src))
    streamed = jobs.run_available_now(
        QS.quality_features_frame(stream_in), "quality_stream_out", spark
    )

    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in streamed.collect())
    assert b == s, "streaming micro-batch output differs from the batch run"

    kept, quarantined = QS.quality_split(
        spark.read.schema(DOC_SCHEMA).parquet(str(src))
    )
    k_ids = {r.doc_id for r in kept.collect()}
    q_ids = {r.doc_id for r in quarantined.collect()}
    assert k_ids | q_ids == {0, 1, 2, 3, 4}
    assert not (k_ids & q_ids)
    assert {1, 3} <= q_ids, "repetitive junk must be quarantined by the entropy floor"


def test_entropy_floor_is_the_binding_gate_for_junk(spark):
    df = spark.createDataFrame(
        [(1, "abababababababab", "en", "x", 16)], DOC_SCHEMA
    )
    out = QS.quality_features_frame(df).collect()[0]
    assert out.char_entropy_bits == 1.0
    assert not out.keep


def test_stream_psi_drift_matches_python_reference(spark, tmp_path):
    """Streaming PSI monitor vs a plain-Python recomputation from the
    same rows: identical windows, counts, and PSI values (<= 1e-6 —
    the only slack is float summation order across <= n_bins terms).
    Window 1 mirrors the reference distribution (PSI near 0); window 2
    concentrates all mass in one bin AND leaves reference bins empty —
    both drift directions (new-bin mass + vanished-bin mass) must
    contribute."""
    import json
    import math

    eps, n_bins = 1e-6, 10
    ref_frame = spark.createDataFrame(
        [(float(v),) for v in (5, 15, 25, 35, 45, 55, 65, 75, 85, 95)] * 3,
        "value double",
    )
    reference, mn, mx = QS.reference_histogram(ref_frame, "value", mn=0.0, mx=100.0)
    ref = {int(r["bin"]): float(r["ref_share"]) for r in reference.collect()}

    rows = [
        # window 1 (00:00-00:15): one event per bin — matches reference
        *[("2024-01-01T00:%02d:00" % (i + 1), float(10 * i + 5)) for i in range(10)],
        # window 2 (00:15-00:30): everything piles into bin 0, including
        # BELOW-RANGE outliers (v < mn) that must clamp into bin 0
        # instead of minting unbounded negative pseudo-bins — the
        # downward-drift scenario the monitor exists to catch
        *[("2024-01-01T00:%02d:00" % (16 + i), 1.0) for i in range(3)],
        ("2024-01-01T00:19:00", -50.0),
        ("2024-01-01T00:20:00", -1000.0),
        # watermark sentinel: pushes event time past window 2's close so
        # append mode emits it; its own window stays open and unemitted
        ("2024-01-01T00:40:00", 50.0),
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "f0.jsonl").write_text(
        "\n".join(json.dumps({"ts": t, "value": v}) for t, v in rows)
    )
    stream = (
        spark.readStream.schema("ts string, value double")
        .json(str(src))
        .select(F.to_timestamp("ts").alias("ts"), "value")
    )
    out = str(tmp_path / "out")
    q = (
        QS.stream_psi_drift(stream, reference, mn, mx, every="15 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        r["window_start"].minute: (r["n_events"], r["psi"])
        for r in spark.read.parquet(out).collect()
    }
    assert set(got) == {0, 15}

    def py_psi(values):
        n = len(values)
        cnt: dict[int, int] = {}
        for v in values:
            # floor (not int(): truncation diverges below zero) + BOTH
            # clamps — the production _bin_expr contract
            b = max(min(math.floor((v - 0.0) * n_bins / 100.0), n_bins - 1), 0)
            cnt[b] = cnt.get(b, 0) + 1
        psi = 0.0
        for b in set(cnt) | set(ref):
            p = cnt.get(b, 0) / n + eps
            r = ref.get(b, 0.0) + eps
            psi += (p - r) * math.log(p / r)
        return n, psi

    for minute, values in (
        (0, [10.0 * i + 5 for i in range(10)]),
        (15, [1.0, 1.0, 1.0, -50.0, -1000.0]),
    ):
        n, psi = py_psi(values)
        assert got[minute][0] == n
        assert abs(got[minute][1] - psi) <= 1e-6, (minute, got[minute][1], psi)
    assert got[0][1] < 0.05 < got[15][1]  # matched window ~0, drifted window large


def test_stream_drift_monitor_ks_matches_python_reference(spark, tmp_path):
    """The folded PSI+KS monitor vs a plain-Python recomputation over
    the same bins: the KS column must equal max |CDF_live − CDF_ref|
    over the fixed bin order, including the CDF jumps contributed by
    reference bins the window never hit (the vanished-mass direction)."""
    import json
    import math

    n_bins = 10
    ref_frame = spark.createDataFrame(
        [(float(v),) for v in (5, 15, 25, 35, 45, 55, 65, 75, 85, 95)] * 3,
        "value double",
    )
    reference, mn, mx = QS.reference_histogram(ref_frame, "value", mn=0.0, mx=100.0)
    ref = {int(r["bin"]): float(r["ref_share"]) for r in reference.collect()}

    rows = [
        # window 1: mirrors the reference (KS ~ 0)
        *[("2024-01-01T00:%02d:00" % (i + 1), float(10 * i + 5)) for i in range(10)],
        # window 2: all mass in bin 0 (KS -> 0.9: CDF_live jumps to 1 at
        # bin 0 while CDF_ref is 0.1 there)
        *[("2024-01-01T00:%02d:00" % (16 + i), 1.0) for i in range(4)],
        ("2024-01-01T00:20:00", -500.0),  # below-range clamp into bin 0
        ("2024-01-01T00:40:00", 50.0),  # watermark sentinel
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "f0.jsonl").write_text(
        "\n".join(json.dumps({"ts": t, "value": v}) for t, v in rows)
    )
    stream = (
        spark.readStream.schema("ts string, value double")
        .json(str(src))
        .select(F.to_timestamp("ts").alias("ts"), "value")
    )
    out = str(tmp_path / "out")
    q = (
        QS.stream_drift_monitor(stream, reference, mn, mx, every="15 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        r["window_start"].minute: (r["n_events"], r["psi"], r["ks_stat"], r["w1_distance"])
        for r in spark.read.parquet(out).collect()
    }
    assert set(got) == {0, 15}

    def py_stats(values):
        n = len(values)
        cnt: dict[int, int] = {}
        for v in values:
            b = max(min(math.floor((v - 0.0) * n_bins / 100.0), n_bins - 1), 0)
            cnt[b] = cnt.get(b, 0) + 1
        eps, psi, cp, cq, ks, w1 = 1e-6, 0.0, 0.0, 0.0, 0.0, 0.0
        for b in range(n_bins):
            p = cnt.get(b, 0) / n
            q = ref.get(b, 0.0)
            cp, cq = cp + p, cq + q
            ks = max(ks, abs(cp - cq))
            w1 += abs(cp - cq)
            psi += (p + eps - q - eps) * math.log((p + eps) / (q + eps))
        return n, psi, ks, w1 * (100.0 / n_bins)  # scaled to value units

    for minute, values in (
        (0, [10.0 * i + 5 for i in range(10)]),
        (15, [1.0, 1.0, 1.0, 1.0, -500.0]),
    ):
        n, psi, ks, w1 = py_stats(values)
        assert got[minute][0] == n
        assert abs(got[minute][1] - psi) <= 1e-6
        assert abs(got[minute][2] - ks) <= 1e-6
        assert abs(got[minute][3] - w1) <= 1e-6
    assert got[0][2] < 0.05 < got[15][2]  # matched ~0, drifted ~0.9
    assert abs(got[15][2] - 0.9) <= 1e-6
    # W1 in value units: all mass moved from mid-range bins to bin 0 —
    # cumulative gap 0.9, 0.8, ... 0.1 over 10-unit bins = 45.0 exactly
    assert got[0][3] < 1.0 < got[15][3]
    assert abs(got[15][3] - 45.0) <= 1e-5

    # the single-stat views are projections of the same plan
    ks_only = QS.stream_ks_drift(stream, reference, mn, mx, every="15 minutes")
    assert set(ks_only.schema.names) == {"window_start", "window_end", "n_events", "ks_stat"}
    psi_only = QS.stream_psi_drift(stream, reference, mn, mx, every="15 minutes")
    assert set(psi_only.schema.names) == {"window_start", "window_end", "n_events", "psi"}


def test_stream_drift_monitor_checkpoint_recovery(spark, tmp_path):
    """Stop after the first micro-batch, land more files, resume the SAME
    checkpoint: emissions equal an uninterrupted twin run (offsets and
    window state recover; closed windows are not re-emitted)."""
    import json

    ref_frame = spark.createDataFrame(
        [(float(v),) for v in (5, 15, 25, 35, 45, 55, 65, 75, 85, 95)] * 3,
        "value double",
    )
    reference, mn, mx = QS.reference_histogram(ref_frame, "value", mn=0.0, mx=100.0)

    batch1 = [
        *[("2024-01-01T00:%02d:00" % (i + 1), float(10 * i + 5)) for i in range(10)],
        ("2024-01-01T00:40:00", 50.0),  # closes window 1
    ]
    batch2 = [
        *[("2024-01-01T00:%02d:00" % (46 + i), 1.0) for i in range(5)],
        ("2024-01-01T01:30:00", 50.0),  # closes the 00:30 and 00:45 windows
    ]

    def run(src, out, ck):
        stream = (
            spark.readStream.schema("ts string, value double")
            .json(str(src))
            .select(F.to_timestamp("ts").alias("ts"), "value")
        )
        q = (
            QS.stream_drift_monitor(stream, reference, mn, mx, every="15 minutes")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    def write(src, name, rows):
        src.mkdir(exist_ok=True)
        (src / name).write_text(
            "\n".join(json.dumps({"ts": t, "value": v}) for t, v in rows)
        )

    # interrupted run: batch1, stop, batch2, resume same checkpoint
    src_a, out_a, ck_a = tmp_path / "a_in", tmp_path / "a_out", tmp_path / "a_ck"
    write(src_a, "f0.jsonl", batch1)
    run(src_a, out_a, ck_a)
    assert spark.read.parquet(str(out_a)).count() == 1  # window 1 emitted
    write(src_a, "f1.jsonl", batch2)
    run(src_a, out_a, ck_a)

    # uninterrupted twin: both files visible from the start
    src_b, out_b, ck_b = tmp_path / "b_in", tmp_path / "b_out", tmp_path / "b_ck"
    write(src_b, "f0.jsonl", batch1)
    write(src_b, "f1.jsonl", batch2)
    run(src_b, out_b, ck_b)

    def rows(p):
        return {
            (r["window_start"], r["n_events"], r["psi"], r["ks_stat"], r["w1_distance"])
            for r in spark.read.parquet(str(p)).collect()
        }

    got_a, got_b = rows(out_a), rows(out_b)
    assert got_a == got_b
    assert len(got_a) >= 2  # window 1 plus the drifted 00:45 window


def test_reference_histogram_rejects_degenerate_range(spark):
    import pytest

    const = spark.createDataFrame([(42.0,)] * 5, "value double")
    with pytest.raises(ValueError, match="degenerate"):
        QS.reference_histogram(const, "value")
    with pytest.raises(ValueError, match="degenerate"):
        QS.stream_psi_drift(const, const, mn=1.0, mx=1.0)
