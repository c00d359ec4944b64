"""Query plans: the registry of every implemented query/operator.

Import :func:`all_queries` / :func:`all_oracles` — importing this package
pulls in every plan module so registration side effects run.
"""

from __future__ import annotations

from kafka_streaming_polymarket_pipeline_spark.plans.registry import (  # noqa: F401
    Query,
    all_oracles,
    all_queries,
    get,
    register,
)


def _load_all() -> None:
    # Import order is alphabetical-ish; each module registers its queries.
    from kafka_streaming_polymarket_pipeline_spark.plans import (  # noqa: F401
        bpe_plans,
        clustering_plans,
        dedup_plans,
        gold,
        packing_plans,
        pipeline_plans,
        relational,
        retrieval_plans,
        sampling_plans,
        similarity_plans,
        sketch_plans,
        survey_ops,
        text_plans,
    )


_load_all()
