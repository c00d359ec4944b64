"""Streaming two-stream interval-overlap join (j10's streaming form):
stream == batch on contract-conforming input, the max-duration /
empty-interval drop contract, and checkpoint recovery. availableNow
triggers keep every run deterministic."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import (
    interval_overlap_join,
)
from kafka_streaming_polymarket_pipeline_spark.streaming import jobs

MAX_D = 4 * 3600  # 4 h duration contract for these tests

LEFT = [
    # (iid, start, end)
    (1, "2024-01-01T01:00:00", "2024-01-01T03:00:00"),
    (2, "2024-01-01T10:00:00", "2024-01-01T10:30:00"),
    (3, "2024-01-01T20:00:00", "2024-01-01T20:00:00"),  # empty: dropped
    (4, "2024-01-01T05:00:00", "2024-01-01T12:00:00"),  # 7 h > D: dropped
]
RIGHT = [
    (10, "2024-01-01T02:59:59", "2024-01-01T04:00:00"),  # overlaps 1 by 1 s
    (11, "2024-01-01T03:00:00", "2024-01-01T04:00:00"),  # touches 1: NO overlap
    (12, "2024-01-01T10:10:00", "2024-01-01T10:20:00"),  # contained in 2
    (13, "2024-01-01T19:00:00", "2024-01-01T21:00:00"),  # meets only empty 3
]


def _write_jsonl(d, rows):
    d.mkdir(exist_ok=True)
    (d / "f0.jsonl").write_text(
        "\n".join(json.dumps({"iid": i, "s": s, "e": e}) for i, s, e in rows)
    )


def _stream(spark, d):
    return (
        spark.readStream.schema("iid long, s string, e string")
        .json(str(d))
        .select("iid", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))
    )


def _run(spark, tmp_path, out_name="out"):
    out, ck = str(tmp_path / out_name), str(tmp_path / f"{out_name}_ck")
    q = (
        jobs.stream_interval_overlap_join(
            _stream(spark, tmp_path / "l"),
            _stream(spark, tmp_path / "r"),
            "s", "e",
            max_duration_seconds=MAX_D,
            bucket_seconds=3600,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    return out


def test_stream_overlap_equals_batch_and_drop_contract(spark, tmp_path):
    _write_jsonl(tmp_path / "l", LEFT)
    _write_jsonl(tmp_path / "r", RIGHT)
    out = _run(spark, tmp_path)
    got = {
        (r["iid"], r["r_iid"]) for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 10), (2, 12)}  # touch excluded, empty+overlong dropped

    # stream == batch on the contract-conforming subset
    def frame(rows):
        return spark.createDataFrame(rows, "iid long, s string, e string").select(
            "iid", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e")
        ).filter(
            (F.unix_micros("e") > F.unix_micros("s"))
            & (F.unix_micros("e") - F.unix_micros("s") <= MAX_D * 1_000_000)
        )

    want = {
        (r["iid"], r["r_iid"])
        for r in interval_overlap_join(
            frame(LEFT), frame(RIGHT), "s", "e", bucket_seconds=3600
        ).collect()
    }
    assert got == want


def test_stream_overlap_meet_once_across_buckets(spark, tmp_path):
    # 3.5 h intervals overlapping for hours across several shared hourly
    # buckets must emit exactly ONE row (later-start meet-once rule)
    _write_jsonl(tmp_path / "l", [(1, "2024-01-01T00:30:00", "2024-01-01T04:00:00")])
    _write_jsonl(tmp_path / "r", [(2, "2024-01-01T01:15:00", "2024-01-01T04:45:00")])
    out = _run(spark, tmp_path)
    assert spark.read.parquet(out).count() == 1


def test_stream_overlap_checkpoint_recovery(spark, tmp_path):
    """Restart from checkpoint after a new right-side interval arrives:
    only the NEW pair is appended — join state and offsets recover."""
    _write_jsonl(tmp_path / "l", LEFT[:2])
    _write_jsonl(tmp_path / "r", RIGHT[:1])
    out = _run(spark, tmp_path)
    assert {(r["iid"], r["r_iid"]) for r in spark.read.parquet(out).collect()} == {
        (1, 10)
    }

    (tmp_path / "r" / "f1.jsonl").write_text(
        json.dumps({"iid": 12, "s": "2024-01-01T10:10:00", "e": "2024-01-01T10:20:00"})
    )
    _run(spark, tmp_path)
    got = {(r["iid"], r["r_iid"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 10), (2, 12)}  # old pair kept once, new pair appended


def test_stream_overlap_extra_keys_scopes_pairs(spark, tmp_path):
    """extra_keys joins intervals only within the same key: identical
    time spans on different symbols must NOT pair."""
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    (ldir / "f0.jsonl").write_text(
        "\n".join(
            json.dumps({"iid": i, "sym": s, "s": st, "e": en})
            for i, s, st, en in [
                (1, "BTC", "2024-01-01T01:00:00", "2024-01-01T03:00:00"),
                (2, "ETH", "2024-01-01T01:00:00", "2024-01-01T03:00:00"),
            ]
        )
    )
    (rdir / "f0.jsonl").write_text(
        json.dumps(
            {"iid": 10, "sym": "BTC", "s": "2024-01-01T02:00:00", "e": "2024-01-01T04:00:00"}
        )
    )

    def stream(d):
        return (
            spark.readStream.schema("iid long, sym string, s string, e string")
            .json(str(d))
            .select(
                "iid", "sym",
                F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"),
            )
        )

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        jobs.stream_interval_overlap_join(
            stream(ldir), stream(rdir), "s", "e",
            max_duration_seconds=4 * 3600, bucket_seconds=3600,
            extra_keys=["sym"],
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.read.parquet(out).collect()
    assert {(r["iid"], r["r_iid"], r["sym"]) for r in rows} == {(1, 10, "BTC")}
    assert "r_sym" not in spark.read.parquet(out).columns  # key kept once
