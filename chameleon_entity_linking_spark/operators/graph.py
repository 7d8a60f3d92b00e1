"""Graph expansion operators: k-hop frontier BFS + personalized
PageRank as iterative DataFrame joins.

The reference expands entity neighborhoods with in-memory BFS/DFS and
personalized PageRank over a scipy CSR matrix
(`utils/entity_expander.py:80-129`). Here both are driver-controlled
iterative joins over an ``edges(src, dst)`` DataFrame — the classic
distributed formulation (frontier joins for BFS, rank-mass joins for
PPR), each round ``localCheckpoint``-ed to truncate lineage.

DFS (G2) is inherently order-dependent single-process semantics and is
deliberately not reproduced; k-hop BFS covers the reachability
capability (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def k_hop_expand(
    edges: DataFrame, seeds: DataFrame, k: int, directed: bool = False
) -> DataFrame:
    """All nodes within k hops of any seed (G1 analogue).

    seeds(node) -> (node, hop) with the minimal hop distance (seeds
    at hop 0). Frontier-join BFS: each round joins the frontier to
    the edge list and anti-joins already-visited nodes, so work is
    proportional to the expansion, not the graph.
    """
    e = edges if directed else _symmetrize(edges)
    e = e.localCheckpoint()
    visited = seeds.select(
        F.col("node"), F.lit(0).alias("hop")
    ).localCheckpoint()
    frontier = visited.select("node")
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        nxt = nxt.localCheckpoint()
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return visited


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.85,
    iterations: int = 15,
    directed: bool = False,
) -> DataFrame:
    """Personalized PageRank by power iteration over rank-mass joins
    (G3 analogue of ``pagerank_power(G, personalize=seed)``,
    `utils/entity_expander.py:116-126`).

    seeds(node) carry equal restart mass. Dangling mass is restarted
    to the seeds (standard PPR semantics). Returns (node, rank).

    One job per iteration: the dangling mass (sum of rank on nodes
    with no outgoing edges) is an OBSERVED metric of the iteration's
    ``localCheckpoint`` job — the same fuse-the-scalar-into-the-
    checkpoint pattern as cluster._checkpoint_with_fingerprint. (The
    previous form ran a separate driver ``collect`` per iteration:
    2x the fixed job latency over 15 iterations.)
    """
    e = edges if directed else _symmetrize(edges)
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e = e.join(out_deg, "src").localCheckpoint()
    # nodes WITH out-edges; a rank row that fails this join is dangling
    has_out = (
        e.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.lit(True).alias("has_out"))
        .localCheckpoint()
    )
    n_seeds = seeds.count()
    restart = seeds.select(
        "node", F.lit(1.0 / n_seeds).alias("restart_mass")
    ).localCheckpoint()

    def _checkpoint_with_dangling(r: DataFrame) -> tuple[DataFrame, float]:
        obs = Observation()
        r = (
            r.join(has_out, "node", "left")
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.when(F.col("has_out").isNull(), F.col("rank"))),
                    F.lit(0.0),
                ).alias("dangling"),
            )
            .drop("has_out")
            .localCheckpoint()
        )
        return r, float(obs.get["dangling"])

    ranks, dangling = _checkpoint_with_dangling(
        restart.select("node", F.col("restart_mass").alias("rank"))
    )
    for _ in range(iterations):
        contribs = (
            ranks.join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("inflow"))
        )
        new_ranks = (
            restart.join(contribs, "node", "left_outer")
            .select(
                "node",
                (
                    (1 - alpha) * F.col("restart_mass")
                    + alpha
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + dangling * F.col("restart_mass")
                    )
                ).alias("rank"),
            )
        )
        # nodes reached beyond the restart set
        reached = contribs.join(restart.select("node"), "node", "left_anti").select(
            "node", (alpha * F.col("inflow")).alias("rank")
        )
        ranks, dangling = _checkpoint_with_dangling(
            new_ranks.unionByName(reached)
        )
    return ranks


def top_k_expansion(
    edges: DataFrame, seeds: DataFrame, k: int, **ppr_kwargs
) -> DataFrame:
    """Top-k expansion candidates by PPR, excluding the seeds
    (the W4 analogue: `utils/entity_expander.py:125`).

    Global top-k via orderBy().limit(k): compiles to a distributed
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows) — never a single-partition window Exchange.
    """
    ranks = personalized_pagerank(edges, seeds, **ppr_kwargs)
    cand = ranks.join(seeds.select("node"), "node", "left_anti")
    return cand.orderBy(F.desc("rank"), F.asc("node")).limit(k).select(
        "node", "rank"
    )
