"""Oracle output-type portability gate (r10, after the r09 x9/e2e_d FAIL).

Root cause of the only two red rows in CORRECTNESS_r09: DuckDB's
sum(BIGINT) returns HUGEINT (int128), and the uncast score_micro /
key_micro columns in the x9 / e2e_corpus_build_d oracles surfaced as
int128/decimal through the official driver's fetch path, hash-mismatching
Spark's int64 even though every VALUE was equal. A fetchall()-based
compare (driver_sim, the judge's battery) coerces to Python int and
passes — which is exactly why the divergence looked "environment
sensitive". This test pins every registered oracle's DuckDB output
schema to the portable type set that has survived official gating, so a
HUGEINT (or any other exotic type) can never reach a gated output again.

Relation `.types` is available without executing the query, so this
covers all ~200 oracles in seconds at sf0.001.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from kafka_streaming_polymarket_pipeline_spark.plans.registry import all_oracles

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# Types with a proven-green official CORRECTNESS row behind them.
PORTABLE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        t = os.path.basename(p).split(".")[0]
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_no_oracle_outputs_nonportable_types(con):
    bad = {}
    for name, sql in all_oracles().items():
        rel = con.sql(sql)  # lazy: binds + types, does not execute
        offending = [
            (c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) not in PORTABLE
        ]
        if offending:
            bad[name] = offending
    assert not bad, (
        "oracles leaking non-portable DuckDB types into gated output "
        f"(HUGEINT was the r09 x9/e2e_d root cause): {bad}"
    )
