"""Sketch queries: count-min heavy hitters (a15).

Unlike a13 (HLL, rows-only by mathematical necessity), the CMS here is
md5-bucketed and therefore FULLY hash-gated: the oracle rebuilds the
identical d x w counter table and probes it in SQL, pinning both the
estimates and the one-sided error (overestimate >= 0) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streaming_polymarket_pipeline_spark.operators import sketch as SK
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

_BUCKET_SQL = (
    "('0x' || substr(md5(concat_ws(':', CAST({seed} AS VARCHAR), "
    "CAST({key} AS VARCHAR))), 1, 8))::BIGINT % " + str(SK.CMS_WIDTH)
)


@register(
    "a15_cms_heavy_hitters",
    oracle=f"""
WITH seeds AS (SELECT unnest(range(0, {SK.CMS_DEPTH})) AS seed),
counters AS (
  SELECT s.seed, {_BUCKET_SQL.format(seed='s.seed', key='e.user_id')} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events e CROSS JOIN seeds s
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n FROM events GROUP BY user_id
),
topk AS (
  SELECT user_id, exact_n FROM exact ORDER BY exact_n DESC, user_id LIMIT 10
),
est AS (
  SELECT t.user_id, min(c.cnt) AS cms_est
  FROM topk t CROSS JOIN seeds s
  JOIN counters c
    ON c.seed = s.seed
   AND c.bucket = {_BUCKET_SQL.format(seed='s.seed', key='t.user_id')}
  GROUP BY t.user_id
)
SELECT t.user_id, t.exact_n, e.cms_est, e.cms_est - t.exact_n AS overestimate
FROM topk t JOIN est e USING (user_id)
""",
)
def a15_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the events user stream: exact top-10 users
    with CMS estimates and the per-row one-sided error, all hash-gated
    (md5 bucket hashing reproduced verbatim by the oracle)."""
    return SK.cms_heavy_hitters(load(spark, sf_dir, "events"), "user_id", k=10)
