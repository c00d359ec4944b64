#!/usr/bin/env python
"""Per-batch stage attribution for the streaming incremental-dedup job
(r11 task 6): replicates bench.py's streaming_dedup_throughput but times
each stage of the foreachBatch body separately.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from kafka_streaming_polymarket_pipeline_spark.session import get_spark  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.streaming import dedup_stream  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.sources.sinks import foreach_batch_sink  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.tables import load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile-sdedup", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

tmp = tempfile.mkdtemp(prefix="profile_sdedup_")
docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
n = docs.count()
src = os.path.join(tmp, "in")
docs.repartition(10).write.parquet(src)
stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 2).parquet(src)

index_path = os.path.join(tmp, "idx")
pairs_path = os.path.join(tmp, "pairs")


def process(batch, batch_id):
    stages = []

    def t(label, fn):
        t0 = time.perf_counter()
        r = fn()
        stages.append((label, round(time.perf_counter() - t0, 3)))
        return r

    batch2 = t("batch_ckpt", lambda: batch.localCheckpoint(eager=True))
    parts = t("parts_ckpt", lambda: dedup_stream.checkpointed_parts(batch2, 0.5, 5))
    pairs = dedup_stream.incremental_pairs_against_index(
        batch2, index_path, 0.5, 5, parts=parts
    )
    t("probe+pairs_write", lambda: pairs.write.mode("overwrite").parquet(
        os.path.join(pairs_path, f"batch={batch_id}")
    ))
    t("index_write", lambda: dedup_stream.write_index_batch(
        batch2, index_path, batch_id, 0.5, 5, parts=parts
    ))
    print(f"batch {batch_id}: " + " ".join(f"{k}={v}" for k, v in stages), flush=True)


t0 = time.perf_counter()
q = foreach_batch_sink(stream, process, os.path.join(tmp, "ck"))
q.awaitTermination()
dt = time.perf_counter() - t0
print(f"total {dt:.2f}s docs/s={n/dt:.0f}")
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
