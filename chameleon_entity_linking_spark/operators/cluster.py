"""Clustering stage: large-star/small-star connected components.

The transitive-closure capability the reference realizes with
single-process BFS/DFS graph expansion
(`utils/entity_expander.py:80-103`), re-expressed as the
alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — pure
DataFrame self-joins/aggregations, O(log n) rounds, each round
``localCheckpoint``-ed to truncate lineage (SURVEY.md G4).

Node ids are strings; min() is lexicographic, which is a total order
— all the algorithm needs.

Convergence detection: (row_count, bit_xor of row hashes) fingerprint
of the (deduplicated) edge set, compared between rounds — one cheap
aggregate job, no driver-side edge materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _dedup(e: DataFrame) -> DataFrame:
    return e.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(Γ(u) ∪ {u}).

    Pure row stream: the per-node minimum is a groupBy-min joined back
    to the edges — no node ever materializes its whole neighbor set
    (a star root's neighborhood is proportional to component size, so
    a collect_set here would be a single-task OOM on a 10^8-member
    component). Output may carry duplicates; the caller dedups once
    per round.
    """
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high->low; for each node u: connect every
    smaller-or-equal neighbor (and u) to the minimum.

    Same row-stream discipline as ``_large_star``: m = min over the
    directed neighbors (all < u, so min(nbrs ∪ {u}) == min(nbrs)),
    joined back to the edge stream — O(1) memory per row, any
    component size. Emits (v, m) for every neighbor v != m plus
    (u, m); duplicates are allowed (deduped once per round).
    """
    directed = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = directed.groupBy("src").agg(F.min("dst").alias("m"))
    nbr_edges = (
        directed.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    # u itself: u > every directed dst >= m, so u != m always
    self_edges = mins.select("src", F.col("m").alias("dst"))
    return nbr_edges.unionByName(self_edges)


def _checkpoint_with_fingerprint(e: DataFrame) -> tuple[DataFrame, tuple]:
    """localCheckpoint ``e`` and return its (row_count, bit_xor-hash)
    fingerprint, computed as OBSERVED metrics inside the checkpoint
    job itself — zero extra jobs per round (the classic per-round
    fingerprint scan doubles the driver-loop job count; at O(log n)
    rounds that fixed latency dominates small inputs).

    bit_xor over distinct rows: order-insensitive, overflow-free.
    """
    obs = Observation()
    e = e.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).localCheckpoint()
    got = obs.get
    return e, (int(got["n"]), int(got["h"]))


def connected_components(
    edges: DataFrame, max_rounds: int = 25
) -> DataFrame:
    """edges(doc_a, doc_b) -> assignments(doc_id, cluster_id).

    cluster_id is the component's minimum doc_id. Only nodes that
    appear in an edge are returned; callers attach singletons via a
    left join + coalesce (see pipeline.assign_clusters).
    """
    e = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    e, prev_fp = _checkpoint_with_fingerprint(_dedup(e))
    for _ in range(max_rounds):
        # one dedup per round (fingerprint comparison needs a set, and
        # it bounds growth); the stars themselves tolerate duplicates
        e, fp = _checkpoint_with_fingerprint(
            _dedup(_small_star(_large_star(e)))
        )
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # converged edge set is a star forest: src (member) -> dst (root)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    members = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("cluster_id")
    )
    return members.select(F.col("src").alias("doc_id"), "cluster_id")


def assign_clusters(all_docs: DataFrame, components: DataFrame) -> DataFrame:
    """Attach cluster ids to every doc; edge-less docs are singletons."""
    return (
        all_docs.select("doc_id")
        .join(components, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
