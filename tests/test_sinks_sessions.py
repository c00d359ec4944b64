"""Sink builders (S5/S7/S9) and the T4 market-session streaming operator."""

from __future__ import annotations

import pytest

import json
from datetime import timedelta

from kafka_streaming_polymarket_pipeline_spark import silver
from kafka_streaming_polymarket_pipeline_spark.sources import sinks
from kafka_streaming_polymarket_pipeline_spark.streaming import jobs
from tests import fixtures as fx
from tests.test_streaming import _write_bronze_jsonl


@pytest.mark.slow  # maintenance/soak-grade runtime; deselected from the bounded default gate (pytest.ini)
def test_bronze_parquet_sink_partitioned_by_date(spark, tmp_path):
    d = tmp_path / "in"
    _write_bronze_jsonl(d / "a.jsonl", fx.asset_prices(6), "asset-prices")
    out, ckpt = str(tmp_path / "bronze_out"), str(tmp_path / "ckpt")
    stream = jobs.file_bronze_stream(spark, str(d))
    q = sinks.bronze_parquet_sink(stream, out, ckpt)
    q.awaitTermination(60)
    q.stop()
    back = spark.read.parquet(out)
    assert back.count() == 6
    assert "ingest_date" in back.columns  # physical partition column survives
    # partition pruning works on the landed layout
    assert back.filter("ingest_date = date'2026-01-25'").count() == 6


def test_foreach_batch_sink_captures_batches(spark, tmp_path):
    d = tmp_path / "in"
    _write_bronze_jsonl(d / "a.jsonl", fx.asset_prices(4), "asset-prices")
    seen: list[tuple[int, int]] = []
    stream = silver.btc_prices(jobs.file_bronze_stream(spark, str(d)))
    q = sinks.foreach_batch_sink(stream, lambda b, i: seen.append((i, b.count())))
    q.awaitTermination(60)
    q.stop()
    assert sum(n for _, n in seen) == 4


def test_market_sessions_bounded_by_window(spark, tmp_path):
    d = tmp_path / "pos"
    _write_bronze_jsonl(d / "a.jsonl", fx.positions(3, 5), "user-positions")
    pos = silver.positions(jobs.file_bronze_stream(spark, str(d)))
    mkts = silver.markets(fx.bronze_rows(spark, [fx.MARKET], "market-updates"))
    out = jobs.run_available_now(
        jobs.market_sessions(pos, mkts), "t_sessions", spark, mode="complete"
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.market_id == "543210"
    assert r.n_events == 15  # 3 snapshots x 5 wallets, all inside [start, end)
    assert r.session_start == fx.T0.replace(tzinfo=None)
    assert r.first_event == (fx.T0 + timedelta(seconds=10)).replace(tzinfo=None)
    assert r.last_event == (fx.T0 + timedelta(seconds=30)).replace(tzinfo=None)


def test_upsert_parquet_latest_wins(spark, tmp_path):
    path = str(tmp_path / "resolutions")
    first = spark.createDataFrame(
        [("m1", "Unknown", 0.5), ("m2", "Up", 1.0)],
        "market_id string, winner string, final_yes_price double",
    )
    sinks.upsert_parquet(spark, first, path, ["market_id"])
    late = spark.createDataFrame(
        [("m1", "Down", 0.0), ("m3", "Up", 1.0)],
        "market_id string, winner string, final_yes_price double",
    )
    sinks.upsert_parquet(spark, late, path, ["market_id"])
    got = {r.market_id: r.winner for r in spark.read.parquet(path).collect()}
    assert got == {"m1": "Down", "m2": "Up", "m3": "Up"}  # m1 replaced, m2 kept


def test_jdbc_sink_roundtrip_embedded_derby(spark, tmp_path):
    """S7 against a REAL database: Apache Derby (embedded, ships in
    Spark's jars) — streaming frame -> foreachBatch JDBC append -> read
    back via spark.read.jdbc. The path a deployment points at Postgres."""
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    d = tmp_path / "in"
    _write_bronze_jsonl(d / "a.jsonl", fx.asset_prices(5), "asset-prices")
    stream = silver.btc_prices(jobs.file_bronze_stream(spark, str(d)))
    q = sinks.jdbc_sink(stream, url, "btc_prices", str(tmp_path / "ck"), properties=props)
    q.awaitTermination(60)
    q.stop()
    back = spark.read.jdbc(url, "btc_prices", properties=props)
    assert back.count() == 5
    assert {r.ticker for r in back.select("ticker").distinct().collect()} == {"BTC"}
    # typed columns survived the JDBC round trip
    kinds = dict(back.dtypes)
    assert kinds["price"].startswith("decimal")


def test_upsert_crash_recovery_states(spark, tmp_path):
    """A crash at any point of the staged-write + rename swap must leave a
    readable table: simulate each interrupted state and assert the next
    upsert call repairs it and lands correctly."""
    import os
    import shutil

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("m1", "Up")], "market_id string, winner string"
    )
    sinks.upsert_parquet(spark, base, path, ["market_id"])

    # crash before the first rename: stale __staged next to a live table
    shutil.copytree(path, path + "__staged")
    sinks.upsert_parquet(
        spark,
        spark.createDataFrame([("m2", "Down")], "market_id string, winner string"),
        path, ["market_id"],
    )
    assert not os.path.exists(path + "__staged")

    # crash between the two renames: live missing, __prev holds the old table
    os.rename(path, path + "__prev")
    sinks.upsert_parquet(
        spark,
        spark.createDataFrame([("m3", "Up")], "market_id string, winner string"),
        path, ["market_id"],
    )
    assert not os.path.exists(path + "__prev")

    # crash after the swap, before cleanup: both live and __prev present
    shutil.copytree(path, path + "__prev")
    sinks.upsert_parquet(
        spark,
        spark.createDataFrame([("m1", "Down")], "market_id string, winner string"),
        path, ["market_id"],
    )
    assert not os.path.exists(path + "__prev")

    got = {r.market_id: r.winner for r in spark.read.parquet(path).collect()}
    assert got == {"m1": "Down", "m2": "Down", "m3": "Up"}


def test_upsert_sink_streaming(spark, tmp_path):
    d = tmp_path / "in"
    _write_bronze_jsonl(d / "a.jsonl", [fx.resolution()], "market-resolutions")
    res = silver.resolutions(jobs.file_bronze_stream(spark, str(d)))
    path = str(tmp_path / "out")
    q = sinks.upsert_sink(res, path, ["market_id"], str(tmp_path / "ck"))
    q.awaitTermination(60)
    q.stop()
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1 and rows[0].winner == "Up"
    assert rows[0].final_yes_price == 1.0  # double, not the wire's string


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """T6/T7: restart from checkpoint neither loses nor duplicates rows.

    Run 1 drains file A into a parquet sink; run 2 (same checkpoint) sees
    files A+B but must append only B's rows — offsets come from the
    checkpoint, not the source listing.
    """
    src, out, ck = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        stream = jobs.file_bronze_stream(spark, str(src))
        q = (
            silver.btc_prices(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    _write_bronze_jsonl(src / "a.jsonl", fx.asset_prices(10), "asset-prices")
    run_once()
    assert spark.read.parquet(out).count() == 10

    _write_bronze_jsonl(src / "b.jsonl", fx.asset_prices(25)[10:], "asset-prices")
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 25  # 10 old + 15 new, no dupes
    assert got.select("price_timestamp").distinct().count() == 25


def test_bucketed_upsert_latest_wins_and_matches_flat(spark, tmp_path):
    """The partition-pruned bucketed MERGE must produce exactly the same
    logical table as the flat full-rewrite form."""
    flat, bucketed = str(tmp_path / "flat"), str(tmp_path / "bkt")
    first = spark.createDataFrame(
        [(f"m{i}", "Unknown", 0.5) for i in range(40)],
        "market_id string, winner string, final_yes_price double",
    )
    late = spark.createDataFrame(
        [("m3", "Down", 0.0), ("m17", "Up", 1.0), ("new1", "Up", 1.0)],
        "market_id string, winner string, final_yes_price double",
    )
    for batch in (first, late):
        sinks.upsert_parquet(spark, batch, flat, ["market_id"])
        sinks.upsert_parquet_bucketed(spark, batch, bucketed, ["market_id"], n_buckets=8)
    a = {(r.market_id, r.winner, r.final_yes_price)
         for r in spark.read.parquet(flat).collect()}
    b = {(r.market_id, r.winner, r.final_yes_price)
         for r in sinks.read_upserted(spark, bucketed).collect()}
    assert a == b and len(b) == 41
    assert "__kbucket" not in sinks.read_upserted(spark, bucketed).columns


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The point of the bucketed layout: an upsert must leave every
    untouched bucket's files byte-identical ON DISK (same paths, same
    mtimes) — proof the merge read+rewrote only the touched partitions."""
    import os

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(f"m{i}", float(i)) for i in range(200)], "market_id string, v double"
    )
    sinks.upsert_parquet_bucketed(spark, base, path, ["market_id"], n_buckets=16)

    def snapshot():
        out = {}
        for bdir in os.listdir(path):
            if not bdir.startswith("__kbucket="):
                continue
            for f in os.listdir(os.path.join(path, bdir)):
                p = os.path.join(path, bdir, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = snapshot()
    batch = spark.createDataFrame([("m7", -1.0)], "market_id string, v double")
    sinks.upsert_parquet_bucketed(spark, batch, path, ["market_id"], n_buckets=16)
    after = snapshot()

    from pyspark.sql import functions as F
    (touched,) = (
        batch.select(F.pmod(F.xxhash64("market_id"), F.lit(16)).cast("int").alias("b"))
        .distinct().collect()
    )
    touched_dir = f"__kbucket={touched.b}"
    untouched_before = {p: m for p, m in before.items() if touched_dir not in p}
    untouched_after = {p: m for p, m in after.items() if touched_dir not in p}
    assert untouched_before == untouched_after  # identical paths AND mtimes
    assert any(touched_dir in p for p in after)
    got = {r.market_id: r.v for r in sinks.read_upserted(spark, path).collect()}
    assert got["m7"] == -1.0 and len(got) == 200


def test_bucketed_upsert_crash_recovery(spark, tmp_path):
    """Per-bucket swap crash states: a bucket moved to __prev but not yet
    replaced (the only broken state) must be restored; stale __staged and
    leftover __prev must be cleared; replay converges."""
    import os
    import shutil

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(f"m{i}", "Up") for i in range(50)], "market_id string, winner string"
    )
    sinks.upsert_parquet_bucketed(spark, base, path, ["market_id"], n_buckets=8)
    buckets = sorted(d for d in os.listdir(path) if d.startswith("__kbucket="))
    assert len(buckets) > 1

    # crash between a bucket's two renames: live bucket gone, copy in __prev
    os.makedirs(path + "__prev")
    os.rename(os.path.join(path, buckets[0]), os.path.join(path + "__prev", buckets[0]))
    # plus a stale staging dir from the same crashed merge
    shutil.copytree(path, path + "__staged")

    batch = spark.createDataFrame([("m0", "Down")], "market_id string, winner string")
    sinks.upsert_parquet_bucketed(spark, batch, path, ["market_id"], n_buckets=8)
    assert not os.path.exists(path + "__prev")
    assert not os.path.exists(path + "__staged")
    got = {r.market_id: r.winner for r in sinks.read_upserted(spark, path).collect()}
    assert len(got) == 50 and got["m0"] == "Down" and got["m1"] == "Up"


def test_bucketed_upsert_sink_streaming(spark, tmp_path):
    d = tmp_path / "in"
    _write_bronze_jsonl(d / "a.jsonl", [fx.resolution()], "market-resolutions")
    res = silver.resolutions(jobs.file_bronze_stream(spark, str(d)))
    path = str(tmp_path / "out")
    q = sinks.upsert_sink(res, path, ["market_id"], str(tmp_path / "ck"), n_buckets=16)
    q.awaitTermination(60)
    q.stop()
    rows = sinks.read_upserted(spark, path).collect()
    assert len(rows) == 1 and rows[0].winner == "Up"


def test_bucketed_upsert_random_batches_match_flat(spark, tmp_path):
    """Property-style equivalence: any sequence of overlapping upsert
    batches lands the same logical table through the bucketed and flat
    forms (seeded random keys/values, 3 rounds)."""
    import random

    rng = random.Random(20260814)
    flat, bucketed = str(tmp_path / "f"), str(tmp_path / "b")
    for _ in range(3):
        batch = spark.createDataFrame(
            [(f"k{rng.randrange(60)}", rng.random()) for _ in range(rng.randrange(1, 40))],
            "k string, v double",
        ).dropDuplicates(["k"])
        sinks.upsert_parquet(spark, batch, flat, ["k"])
        sinks.upsert_parquet_bucketed(spark, batch, bucketed, ["k"], n_buckets=8)
    a = {(r.k, r.v) for r in spark.read.parquet(flat).collect()}
    b = {(r.k, r.v) for r in sinks.read_upserted(spark, bucketed).collect()}
    assert a == b and len(a) > 0


def test_session_window_exact_gap_boundary_merges(spark):
    """Pin the session_window boundary semantics the w2/w6/a28 oracles
    rely on: an event at a gap of EXACTLY the 30-min duration MERGES
    into the running session (measured; r04 ADVICE suspected the
    opposite), so the gaps-and-islands oracle's strict
    ``> INTERVAL 30 MINUTE`` new-session condition is the correct
    translation.  If a Spark upgrade ever flips this to exclusive, this
    test fails before any oracle can hash-mismatch."""
    from datetime import datetime
    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0),
        (1, t0 + timedelta(minutes=30)),          # exact gap: merges
        (2, t0),
        (2, t0 + timedelta(minutes=30, seconds=1)),  # over gap: splits
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["user_id"]: r["n"]
        for r in df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {1: 1, 2: 2}
