"""fsio: the streaming indexes' metadata I/O must work on URI-style
paths (Hadoop FileSystem resolution), not just bare driver-local paths —
the r08-ADVICE limitation. ``file:`` URIs are the sandbox's stand-in for
object-store schemes: they exercise the exact code path (Path ->
getFileSystem -> FS ops) that a cluster resolves to s3a/abfs/hdfs."""

from __future__ import annotations

import os

import pytest

from kafka_streaming_polymarket_pipeline_spark.streaming import fsio


def test_fsio_primitives_on_file_uri(spark, tmp_path):
    base = f"file:{tmp_path}/idx"
    assert not fsio.exists(base)
    assert fsio.listdir(base) == []
    fsio.mkdirs(base + "/a")
    assert fsio.is_dir(base + "/a")
    fsio.write_text(base + "/m.json", '{"k": 1}')
    assert fsio.read_text(base + "/m.json") == '{"k": 1}'
    assert sorted(fsio.listdir(base)) == ["a", "m.json"]
    fsio.rename(base + "/a", base + "/b")
    assert fsio.is_dir(base + "/b") and not fsio.exists(base + "/a")
    # os.rename contract: refuse an existing destination (Hadoop would
    # move INTO it on local/posix semantics — the compaction corrupter)
    fsio.mkdirs(base + "/c")
    with pytest.raises(FileExistsError):
        fsio.rename(base + "/b", base + "/c")
    files = fsio.list_files_recursive(base)
    assert [(f.rsplit("/", 1)[1], sz) for f, sz in files] == [("m.json", 8)]
    fsio.delete(base + "/c")
    assert not fsio.exists(base + "/c")
    fsio.delete(base + "/never-existed")  # no-op, no raise


def test_dedup_index_on_file_uri(spark, tmp_path):
    """The full per-batch cycle — write index batches, probe, decide
    compaction, compact, probe again — against a ``file:`` URI index
    path. Pair results must match the same cycle on the equivalent bare
    local path (bit-identical FS behavior via RawLocalFileSystem)."""
    from kafka_streaming_polymarket_pipeline_spark.streaming import dedup_stream as DS

    b0 = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog again and again"),
         (1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "a completely unrelated document about sorted merge joins")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog again and again"),
         (4, "sorted merge joins love completely unrelated documents")],
        "doc_id long, text string",
    )

    def run(idx: str) -> list[tuple]:
        got = []
        for bid, batch in enumerate((b0, b1)):
            pairs = DS.incremental_pairs_against_index(batch, idx)
            got += [tuple(r) for r in pairs.collect()]
            DS.write_index_batch(batch, idx, bid)
        return sorted(got)

    uri_idx = f"file:{tmp_path}/uri_idx"
    loc_idx = str(tmp_path / "loc_idx")
    assert run(uri_idx) == run(loc_idx)  # same pairs either way
    assert os.path.exists(tmp_path / "uri_idx" / "_meta.json")

    dec = DS.needs_compaction(uri_idx, max_files_per_bucket=1)
    assert dec["worst"] >= 2  # two batches landed
    stats = DS.compact_index(spark, uri_idx)
    assert set(stats) == {"sigs", "hashed", "buckets"}
    assert all(v["files_after"] >= 1 for v in stats.values())
    # post-compaction probe still sees the whole corpus: doc 5 dups 0/1/3
    b2 = spark.createDataFrame(
        [(5, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    post = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in DS.incremental_pairs_against_index(b2, uri_idx).collect()
    }
    assert {(0, 5), (1, 5), (3, 5)} <= post
