"""Rounding-boundary margin audit for the DSIR integer-micro discipline
(r09 verdict task 1b).

x9's engine-exactness argument is "each transcendental is rounded ONCE to
integer micro-units, everything after is exact BIGINT" — which holds only
if no pre-round value sits so close to a .5 boundary that a libm-vs-JVM
ulp spread could flip the round. This audit computes, in DuckDB alone
(no Spark needed — the question is about the VALUES, not the engines),
every rounded quantity at the gate SF and asserts its distance from the
nearest flip boundary exceeds a margin that is orders of magnitude above
any plausible cross-libm error:

- per-bucket lam pre-round values: |ln| <= ~30, so a multi-ulp log error
  is < 1e-8 micro-units; margin floor 1e-4 is >= 10^4 x that.
- per-doc Gumbel pre-round values: same bound.
- per-doc char entropy vs the round(.,6) >= 2.0 gate: flip needs
  |entropy - 1.9999995| < ~1e-12; margin floor 1e-3 bits.

Measured at r10: lam margin is exactly 0.5 at every gate SF because every
document clears the 2.0-bit entropy gate (min entropy 3.68 bits), making
tgt_cnt == raw_cnt and every lam_micro exactly 0; Gumbel min margin is
1.99e-3 (sf0.01) / 1.87e-4 (sf0.1). The r09 official-gate FAIL was
therefore NOT a rounding flip — see tests/test_oracle_types.py for the
actual (HUGEINT) root cause.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
DOCS = os.path.join(SF_DIR, "documents.parquet")

ENTROPY = """
-coalesce(list_sum(list_transform(
    list_sort(list_distinct(chars)),
    ch -> (CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE)
            / CAST(greatest(len(chars), 1) AS DOUBLE))
          * log2(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE)
            / CAST(greatest(len(chars), 1) AS DOUBLE)))), 0.0)
"""


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return c


def _min_margin_to_half(values):
    return min(abs((v % 1.0) - 0.5) for v in values)


def test_gumbel_micro_margins(con):
    rows = con.execute("""
        SELECT -ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        + 0.5) / 4294967296.0)) * 1e6
        FROM documents
    """).fetchall()
    margin = _min_margin_to_half([r[0] for r in rows])
    assert margin > 1e-4, f"Gumbel pre-round value within {margin} of a .5 boundary"


def test_lam_micro_margins(con):
    rows = con.execute(f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
         string_split(text, '') AS chars
  FROM documents),
lab AS (
  SELECT doc_id, toks,
         CASE WHEN round({ENTROPY}, 6) >= 2.0 THEN 1 ELSE 0 END AS tgt
  FROM base),
grams AS (
  SELECT doc_id, tgt, unnest(toks) AS g FROM lab
  UNION ALL
  SELECT doc_id, tgt, unnest(list_transform(range(1, len(toks)),
                             i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM lab WHERE len(toks) >= 2),
tb AS (
  SELECT doc_id, tgt,
         CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 64 AS INTEGER) AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3),
spine AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS bucket),
bt AS (
  SELECT s.bucket, coalesce(sum(tb.cnt), 0) AS raw_cnt,
         coalesce(sum(CASE WHEN tb.tgt = 1 THEN tb.cnt END), 0) AS tgt_cnt
  FROM spine s LEFT JOIN tb USING (bucket) GROUP BY 1),
tot AS (SELECT CAST(sum(raw_cnt) AS DOUBLE) rtot, CAST(sum(tgt_cnt) AS DOUBLE) ttot FROM bt)
SELECT (ln((tgt_cnt + 1.0) / (ttot + 64.0))
        - ln((raw_cnt + 1.0) / (rtot + 64.0))) * 1e6
FROM bt, tot
    """).fetchall()
    margin = _min_margin_to_half([r[0] for r in rows])
    assert margin > 1e-4, f"lam pre-round value within {margin} of a .5 boundary"


def test_lam_micro_margins_lang_target(con):
    """x9c's lang='en' target produces 64/64 NON-ZERO lams (unlike the
    degenerate entropy target, where every lam is exactly 0) — so this
    is the margin check that actually exercises log-ratio rounding."""
    rows = con.execute("""
WITH lab AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt
  FROM documents),
grams AS (
  SELECT doc_id, tgt, unnest(toks) AS g FROM lab
  UNION ALL
  SELECT doc_id, tgt, unnest(list_transform(range(1, len(toks)),
                             i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM lab WHERE len(toks) >= 2),
tb AS (
  SELECT doc_id, tgt,
         CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 64 AS INTEGER) AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3),
spine AS (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS bucket),
bt AS (
  SELECT s.bucket, coalesce(sum(tb.cnt), 0) AS raw_cnt,
         coalesce(sum(CASE WHEN tb.tgt = 1 THEN tb.cnt END), 0) AS tgt_cnt
  FROM spine s LEFT JOIN tb USING (bucket) GROUP BY 1),
tot AS (SELECT CAST(sum(raw_cnt) AS DOUBLE) rtot, CAST(sum(tgt_cnt) AS DOUBLE) ttot FROM bt)
SELECT (ln((tgt_cnt + 1.0) / (ttot + 64.0))
        - ln((raw_cnt + 1.0) / (rtot + 64.0))) * 1e6
FROM bt, tot
    """).fetchall()
    vals = [r[0] for r in rows]
    assert sum(1 for v in vals if abs(v) > 0.5) == 64, "en-target lam degenerate?"
    margin = _min_margin_to_half(vals)
    assert margin > 1e-4, f"en-target lam pre-round value within {margin} of .5"


def test_entropy_gate_margins(con):
    rows = con.execute(f"""
        WITH base AS (SELECT string_split(text, '') AS chars FROM documents)
        SELECT {ENTROPY} FROM base
    """).fetchall()
    # round(e, 6) >= 2.0 flips only when e crosses 1.9999995.
    margin = min(abs(r[0] - 1.9999995) for r in rows)
    assert margin > 1e-3, f"char entropy within {margin} bits of the 2.0 gate flip"
