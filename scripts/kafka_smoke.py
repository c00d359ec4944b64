#!/usr/bin/env python
"""Real-Kafka round-trip smoke test (r04 verdict item 8).

The in-repo Kafka coverage is plan-construction-only because the sandbox
has no broker; this script is the ready-made first check for a real
deployment — the ONLY transport the test suite cannot exercise.

Usage:
    KAFKA_BOOTSTRAP=host:9092 python scripts/kafka_smoke.py

Skips gracefully (exit 0 with a message) when KAFKA_BOOTSTRAP is unset
or the spark-sql-kafka connector is absent.  What it does when live:

  1. writes 100 JSON events to topic ``pmps_smoke_<pid>`` via the
     engine's write_topic_stream (availableNow);
  2. reads them back with read_topic_stream from earliest;
  3. parses payloads through silver's corrupt-tolerant path and asserts
     round-trip count, offset monotonicity per partition, and payload
     field fidelity.

Exit code 0 = pass/skip, 1 = round-trip failure.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not bootstrap:
        print("kafka_smoke: KAFKA_BOOTSTRAP not set — skipping (this is "
              "expected anywhere without a broker; set it on a real "
              "deployment to validate the one untested transport)")
        return 0

    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.session import get_spark
    from kafka_streaming_polymarket_pipeline_spark.sources import kafka as K

    spark = get_spark(app_name="pmps-kafka-smoke", cpus=4, shuffle_partitions=4)
    if not K.kafka_available(spark):
        print("kafka_smoke: spark-sql-kafka connector not on the classpath "
              "— skipping (add --packages org.apache.spark:"
              "spark-sql-kafka-0-10_2.13:<spark-version>)")
        return 0

    topic = f"pmps_smoke_{os.getpid()}"
    n = 100
    with tempfile.TemporaryDirectory(prefix="kafka_smoke_") as tmp:
        src = os.path.join(tmp, "src")
        events = spark.range(n).select(
            F.col("id").alias("event_id"),
            F.lit("smoke").alias("kind"),
            (F.col("id") * 2).alias("payload_value"),
        )
        events.write.parquet(src)

        # 1. write via the engine's sink builder
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = K.write_topic_stream(
            stream, bootstrap, topic, os.path.join(tmp, "ck_w")
        )
        # write_topic_stream starts a continuous query; bound it
        q.processAllAvailable()
        q.stop()

        # 2. read back from earliest via the engine's source builder
        bronze = K.read_topic_stream(spark, bootstrap, topic, "earliest")
        out = os.path.join(tmp, "out")
        rq = (
            bronze.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(tmp, "ck_r"))
            .trigger(availableNow=True)
            .start()
        )
        rq.awaitTermination(120)
        rq.stop()

        got = spark.read.parquet(out)
        rows = got.collect()
        ok = True
        if len(rows) != n:
            print(f"FAIL: wrote {n} events, read back {len(rows)}")
            ok = False
        # 3. offset monotonicity per partition + payload fidelity
        by_part: dict[int, list[int]] = {}
        vals = set()
        for r in rows:
            by_part.setdefault(r["partition"], []).append(r["offset"])
            payload = json.loads(r["payload"])
            vals.add((payload["event_id"], payload["payload_value"]))
        for p, offs in by_part.items():
            if sorted(offs) != list(range(min(offs), min(offs) + len(offs))):
                print(f"FAIL: partition {p} offsets not contiguous: {sorted(offs)[:10]}...")
                ok = False
        want = {(i, 2 * i) for i in range(n)}
        if vals != want:
            print(f"FAIL: payload fidelity — missing {sorted(want - vals)[:5]}, "
                  f"extra {sorted(vals - want)[:5]}")
            ok = False
        if ok:
            print(f"kafka_smoke: PASS — {n} events round-tripped through "
                  f"{topic} on {bootstrap} with contiguous offsets and "
                  "exact payload fidelity")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
