"""Process-timezone invariance of the driver contract.

The correctness driver may run in any OS timezone. ``tune_session`` pins the
SQL session tz to UTC (JVM-side evaluation), but PySpark's ``collect()``
converts TimestampType through ``datetime.fromtimestamp`` in the *process*
(libc) timezone — so tune_session must pin that too, or every collected
instant arrives shifted by the local UTC offset and hash-mismatches the
UTC-naive DuckDB oracle. Mirrors the reference's UTC-everywhere convention
(/root/reference/consumers/db_writer.py stores epoch-derived UTC rows).

Run in a subprocess: the parent JVM/session must not be disturbed, and the
libc tz of an already-initialized process can't be safely flipped mid-test.
"""

import os
import subprocess
import sys

import pytest

_PROBE = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from kafka_streaming_polymarket_pipeline_spark.session import tune_session

spark = (
    SparkSession.builder.master("local[1]")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
tune_session(spark)
got = spark.sql("select timestamp'2026-01-01 12:00:00' as ts").collect()[0].ts
assert got.tzinfo is None, f"expected naive datetime, got {{got!r}}"
assert (got.year, got.month, got.day, got.hour) == (2026, 1, 1, 12), (
    f"collected instant shifted by process tz: {{got!r}}"
)
print("TZPIN_OK")
"""


@pytest.mark.slow
def test_collect_is_utc_wall_time_under_foreign_process_tz(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["TZ"] = "America/New_York"
    env.pop("SPARK_GRAFT_CPUS", None)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=repo)],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # no repo cwd: exercises the addPyFile ship path too
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TZPIN_OK" in out.stdout
