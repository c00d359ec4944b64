"""Sequence packing + shard writer: invariants, two-phase-vs-naive
equivalence, size bounds, determinism."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import packing as P
from kafka_streaming_polymarket_pipeline_spark.operators.text import token_count
from kafka_streaming_polymarket_pipeline_spark.tables import load


def test_two_phase_prefix_equals_global_window(spark, sf_smoke):
    docs = load(spark, sf_smoke, "documents")
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"], r["seq_first"], r["seq_last"])
        for r in P.packed_sequences(docs, bucket_width=7).collect()  # awkward width on purpose
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = docs.select(
        "doc_id", token_count(F.col("text")).alias("n"),
    ).withColumn("start", F.sum("n").over(w) - F.col("n"))
    for r in naive.collect():
        n, start = r["n"], r["start"]
        exp_last = (start + n - 1) // P.PACK_BUDGET if n > 0 else start // P.PACK_BUDGET
        assert got[r["doc_id"]] == (n, start, start // P.PACK_BUDGET, exp_last)


def test_every_full_sequence_holds_exactly_budget(spark, sf_smoke):
    docs = load(spark, sf_smoke, "documents")
    fill = P.sequence_fill(docs).collect()
    last_seq = max(r["seq_id"] for r in fill)
    for r in fill:
        if r["seq_id"] != last_seq:
            assert r["n_tokens"] == P.PACK_BUDGET, r
        else:
            assert 0 < r["n_tokens"] <= P.PACK_BUDGET
    # sequences are contiguous from 0
    assert sorted(r["seq_id"] for r in fill) == list(range(last_seq + 1))


def test_doc_spanning_multiple_sequences(spark):
    # one 1200-token doc at budget 512 must span sequences 0..2
    rows = [(0, "x " * 100), (1, "y " * 1200), (2, "z " * 10)]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], "doc_id long, text string")
    got = {r["doc_id"]: r for r in P.packed_sequences(df).collect()}
    assert (got[1]["seq_first"], got[1]["seq_last"]) == (0, 2)
    assert got[2]["tok_start"] == 1300
    fill = {r["seq_id"]: r for r in P.sequence_fill(df).collect()}
    assert fill[0]["n_tokens"] == 512 and fill[1]["n_tokens"] == 512
    assert fill[2]["n_tokens"] == 1310 - 1024
    assert fill[0]["n_docs"] == 2  # doc 0 and the head of doc 1


def test_shard_sizes_strictly_bounded_and_deterministic(spark, sf_smoke):
    docs = load(spark, sf_smoke, "documents")
    a = P.shard_assignments(docs, rows_per_shard=64)
    sizes = {r["shard"]: r["n"] for r in a.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    n_docs = docs.count()
    last = max(sizes)
    for s, n in sizes.items():
        assert n == 64 if s != last else 0 < n <= 64
    assert sum(sizes.values()) == n_docs
    # deterministic: a second computation yields the identical assignment
    b = P.shard_assignments(docs, rows_per_shard=64)
    assert a.select("doc_id", "shard_rank", "shard").exceptAll(
        b.select("doc_id", "shard_rank", "shard")
    ).count() == 0
    # ranks are a permutation of 0..n-1
    ranks = sorted(r["shard_rank"] for r in a.select("shard_rank").collect())
    assert ranks == list(range(n_docs))


def test_write_shards_layout_and_determinism(spark, sf_smoke, tmp_path):
    docs = load(spark, sf_smoke, "documents")
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    n1 = P.write_shards(docs, out1, rows_per_shard=128)
    n2 = P.write_shards(docs, out2, rows_per_shard=128)
    assert n1 == n2
    back1 = spark.read.parquet(out1)
    sizes = {
        r["shard"]: r["n"]
        for r in back1.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    last = max(sizes)
    for s, n in sizes.items():
        assert n == 128 if s != last else 0 < n <= 128
    # same doc-id sets per shard across independent writes
    back2 = spark.read.parquet(out2)
    s1 = {(r["shard"], r["doc_id"]) for r in back1.select("shard", "doc_id").collect()}
    s2 = {(r["shard"], r["doc_id"]) for r in back2.select("shard", "doc_id").collect()}
    assert s1 == s2


def test_offset_rollup_spans_multiple_super_buckets(spark):
    """_bucket_offsets with n_buckets > OFFSET_ROLLUP_WIDTH: the two-level
    roll-up must equal the naive global exclusive prefix sum, and the
    unpartitioned level-2 window input must be ceil(n/4096) super-bucket
    rows, not n bucket rows."""
    n = 10_000
    per_bucket = spark.range(n).select(
        F.col("id").alias("_b"), (F.col("id") % 97 + 1).alias("_tot")
    )
    got = {
        r["_b"]: r["_offset"]
        for r in P._bucket_offsets(per_bucket, "_b", "_tot").collect()
    }
    running = 0
    for b in range(n):
        assert got[b] == running, (b, got[b], running)
        running += b % 97 + 1
    # boundedness: the only unpartitioned window runs over super-bucket
    # totals — exactly ceil(n / OFFSET_ROLLUP_WIDTH) rows
    import math

    n_super = per_bucket.select(
        F.floor(F.col("_b") / P.OFFSET_ROLLUP_WIDTH)
    ).distinct().count()
    assert n_super == math.ceil(n / P.OFFSET_ROLLUP_WIDTH) == 3


def test_packing_equivalence_across_super_buckets(spark):
    """packed_sequences with bucket_width=1 over >4096 docs exercises the
    multi-super-bucket roll-up end-to-end; placement must still equal the
    naive global prefix sum."""
    docs = spark.range(9_000).select(
        F.col("id").alias("doc_id"),
        F.trim(F.repeat(F.lit("t "), (F.col("id") % 7).cast("int"))).alias("text"),
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"])
        for r in P.packed_sequences(docs, bucket_width=1).collect()
    }
    running = 0
    for i in range(9_000):
        n = i % 7
        assert got[i] == (n, running), (i, got[i], (n, running))
        running += n


def test_shard_bucket_parallelism(spark, sf_smoke):
    """The ranking window's bucket key has a 4096-value domain (3 hex
    chars): at 1B docs each window task sorts ~n/4096 rows. Recompute the
    operator's bucket expression and assert its bounds; a 16-bucket
    regression (1 hex char) would collapse the distinct count to <=16."""
    docs = load(spark, sf_smoke, "documents")
    b = docs.select(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3), 16, 10)
        .cast("long")
        .alias("_b")
    )
    stats = b.agg(
        F.min("_b").alias("lo"), F.max("_b").alias("hi"),
        F.count_distinct("_b").alias("nd"),
    ).collect()[0]
    assert 0 <= stats["lo"] and stats["hi"] <= 4095
    assert stats["nd"] > 16  # wider than the old 1-hex-digit bucketing


# --- hypothesis property tests -------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.integers(min_value=0, max_value=40).map(lambda n: " ".join(["tok"] * n)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(_texts)
def test_packing_prefix_sum_property(spark, texts):
    """tok_start is the exclusive prefix sum of token counts in doc_id
    order, for arbitrary (including empty) documents."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in P.packed_sequences(df, budget=64).collect()}
    running = 0
    for i, t in enumerate(texts):
        n = len(t.split()) if t else 0
        assert rows[i].n_tokens == n
        assert rows[i].tok_start == running
        running += n


@settings(max_examples=8, deadline=None)
@given(_texts)
def test_packing_fill_invariant_property(spark, texts):
    """Every sequence except the last holds exactly `budget` tokens and
    the total is conserved."""
    budget = 64
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fills = {r.seq_id: r.n_tokens for r in P.sequence_fill(df, budget=budget).collect()}
    total = sum(len(t.split()) if t else 0 for t in texts)
    assert sum(fills.values()) == total
    if fills:
        last = max(fills)
        for sid, n in fills.items():
            if sid != last:
                assert n == budget
            else:
                assert 0 < n <= budget


def test_epoch_shuffle_distinct_permutations(spark, sf_smoke):
    from kafka_streaming_polymarket_pipeline_spark.operators import packing as P
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    docs = load(spark, sf_smoke, "documents").limit(50)
    out = P.epoch_shuffle(docs, n_epochs=3).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = r.epoch_pos
    assert set(by_epoch) == {0, 1, 2}
    n = len(by_epoch[0])
    for k, pos in by_epoch.items():
        # each epoch is an exact permutation of 0..N-1
        assert sorted(pos.values()) == list(range(n)), k
    # epochs order the corpus differently (md5 salting works)
    assert by_epoch[0] != by_epoch[1] and by_epoch[1] != by_epoch[2]
    # deterministic across invocations
    again = {(r.doc_id, r.epoch): r.epoch_pos
             for r in P.epoch_shuffle(docs, n_epochs=3).collect()}
    for k, pos in by_epoch.items():
        for d, p in pos.items():
            assert again[(d, k)] == p


class TestZOrder:
    def test_zorder_tightens_file_spans_vs_natural_order(self, spark):
        """The point of the layout: per-file bounding boxes (what readers
        prune on) must be far tighter under Z-order than insertion order.
        Grid data: 4096 rows over a 64x64 (a,b) grid, 256 rows/file ->
        natural order by id sweeps b fully per file (span ~63) while
        Z-order keeps both spans ~sqrt(256)=16."""
        from pyspark.sql import functions as F

        from kafka_streaming_polymarket_pipeline_spark.operators import packing as P

        rows = [(i, i % 64, i // 64) for i in range(4096)]  # id, a, b
        df = spark.createDataFrame(rows, "event_id long, a long, b long")
        z = P.zorder_layout(
            df, F.col("a"), F.col("b"), rows_per_file=256, order_col="event_id"
        ).collect()
        # natural order: files of 256 consecutive ids
        z_vol = sum((r["a_max"] - r["a_min"] + 1) * (r["b_max"] - r["b_min"] + 1) for r in z) / len(z)
        nat_vol = 64 * 4  # 256 consecutive ids = full a-sweep x 4 b values
        assert len(z) == 16 and all(r["n_rows"] == 256 for r in z)
        assert z_vol == 256, z_vol  # perfect 16x16 tiles on a power-of-two grid
        assert z_vol <= nat_vol  # and never worse than insertion order
