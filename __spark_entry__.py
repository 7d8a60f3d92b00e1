"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship entity-resolution pipeline (interleave ->
normalize -> salted multi-key blocking -> pandas-UDF pair scoring ->
large-star/small-star connected components) over sf0.001.

``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity search, text analysis); oracles are exact DuckDB SQL —
see chameleon_entity_linking_spark/plans/driver_queries.py for the
parity disciplines. ``tools/oracle_check.py`` replays the driver's
comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chameleon_entity_linking_spark.plans.driver_queries import REGISTRY


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ER pipeline over the interleaved lift of `documents`
    (+ deterministic duplicate mentions), returning cluster
    assignments (doc_id, cluster_id, cluster_size)."""
    from pyspark.sql import functions as F

    from chameleon_entity_linking_spark.operators.block import (
        BlockConfig,
        candidate_pairs,
    )
    from chameleon_entity_linking_spark.operators.cluster import (
        assign_clusters,
        connected_components,
    )
    from chameleon_entity_linking_spark.operators.normalize import normalize
    from chameleon_entity_linking_spark.operators.score import (
        ScoreConfig,
        edges_above_threshold,
        score_pairs,
    )
    from chameleon_entity_linking_spark.sources.readers import (
        interleave_documents,
        load,
        with_synthetic_duplicates,
    )

    docs = with_synthetic_duplicates(
        interleave_documents(load(spark, sf_dir, "documents"))
    ).repartition(spark.sparkContext.defaultParallelism)
    doc_norm = normalize(docs).persist()
    # the driver corpus shares a tiny vocabulary, so name-token keys
    # degenerate (every token is stopword-grade); LSH + media carry it.
    # Same reason the match threshold sits far above the default: word
    # salads from a ~40-word vocabulary score ~0.7 against each other,
    # true duplicate mentions ~0.99.
    cfg = BlockConfig(use_token_keys=False, hot_key_cap=128)
    score_cfg = ScoreConfig(threshold=0.905)
    pairs, _ = candidate_pairs(doc_norm, cfg)
    edges = edges_above_threshold(
        score_pairs(pairs, doc_norm, score_cfg), score_cfg
    )
    assignments = assign_clusters(docs, connected_components(edges))
    sizes = assignments.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return assignments.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in REGISTRY.items()
    }
    out["er_pipeline_clusters"] = _flagship  # non-SQL: rows-only check
    return out


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
