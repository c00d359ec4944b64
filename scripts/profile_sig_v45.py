#!/usr/bin/env python
"""v4: ONE aggregation producing (hsh set, sz, m0..m127) from a codegen
explode+substr+hash index — single shingle pass, single shuffle.
v5: hashed arrays via one transform hashing + distinct on longs (map-only).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.session import get_spark  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.tables import load  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
spark = get_spark(app_name="profile-sigs45", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def noop(df, label, n=2):
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"stage": label, "sec": round(best, 3)}), flush=True)


docs = load(spark, SF_DIR, "documents")

idx1 = docs.select(
    F.col("doc_id"),
    F.explode(F.sequence(F.lit(1), F.length("text") - 4)).alias("i"),
    F.col("text"),
).select("doc_id", F.expr("xxhash64(substring(text, i, 5))").alias("h64"))
h32 = F.pmod(F.col("h64"), F.lit(1 << 32))
mins = [
    F.min(
        (F.lit(D._PERM_A[i]) * h32 + F.lit(D._PERM_B[i])) % F.lit(D._MERSENNE_P)
    ).alias(f"m{i}")
    for i in range(D.NUM_PERM)
]
combined = idx1.groupBy("doc_id").agg(
    F.collect_set("h64").alias("hsh"), *mins
).withColumn("sz", F.size("hsh"))
noop(combined, "v4_combined_one_agg")

# v5: map-only array build, hash inside the transform, distinct on longs
t = F.col("text")
idx = F.sequence(F.lit(1), F.length(t) - 4)
grams = F.transform(idx, lambda i: F.xxhash64(t.substr(i, F.lit(5))))
hsh = F.when(F.length(t) >= 5, F.array_distinct(grams)).otherwise(
    F.array().cast("array<bigint>")
)
v5 = docs.select("doc_id", hsh.alias("hsh")).withColumn("sz", F.size("hsh")).filter(
    F.col("sz") > 0
)
noop(v5, "v5_hashed_arrays_longs_maponly")

# and v5 -> sigs from arrays explode (completing the alternative pipeline)
from pyspark.storagelevel import StorageLevel

v5p = v5.persist(StorageLevel.MEMORY_AND_DISK)
t0 = time.perf_counter()
v5p.count()
print(json.dumps({"stage": "v5_build_persist", "sec": round(time.perf_counter() - t0, 3)}), flush=True)
idx5 = v5p.select("doc_id", F.explode("hsh").alias("h64"))
h32b = F.pmod(F.col("h64"), F.lit(1 << 32))
mins5 = [
    F.min(
        (F.lit(D._PERM_A[i]) * h32b + F.lit(D._PERM_B[i])) % F.lit(D._MERSENNE_P)
    ).alias(f"m{i}")
    for i in range(D.NUM_PERM)
]
noop(idx5.groupBy("doc_id").agg(*mins5), "v5_sigs_from_cached")
spark.stop()
