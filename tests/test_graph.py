"""Graph expansion: k-hop BFS vs hand-computed hops, PPR vs a numpy
power-iteration oracle (SURVEY.md §2.8 G1/G3/W4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chameleon_entity_linking_spark.operators.graph import (
    k_hop_expand,
    personalized_pagerank,
    top_k_expansion,
)
from chameleon_entity_linking_spark.sources.trec import to_trec

#  graph: a-b-c-d chain, e-f edge, g isolated-ish via c
EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("c", "g")]


def _edges(spark, edges=EDGES):
    return spark.createDataFrame(edges, "src string, dst string")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


class TestKHop:
    def test_hops_from_single_seed(self, spark):
        got = {
            r.node: r.hop
            for r in k_hop_expand(_edges(spark), _seeds(spark, ["a"]), 2).collect()
        }
        assert got == {"a": 0, "b": 1, "c": 2}

    def test_full_reach_and_disconnected(self, spark):
        got = {
            r.node: r.hop
            for r in k_hop_expand(_edges(spark), _seeds(spark, ["a"]), 10).collect()
        }
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "g": 3}
        assert "e" not in got and "f" not in got

    def test_multi_seed_min_hop(self, spark):
        got = {
            r.node: r.hop
            for r in k_hop_expand(
                _edges(spark), _seeds(spark, ["a", "d"]), 1
            ).collect()
        }
        assert got == {"a": 0, "d": 0, "b": 1, "c": 1}


def _ppr_oracle(edges, seeds, alpha, iters):
    nodes = sorted({x for e in edges for x in e} | set(seeds))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    for s, d in sym:
        A[idx[d], idx[s]] = 1.0
    deg = A.sum(axis=0)
    P = np.divide(A, deg, out=np.zeros_like(A), where=deg > 0)
    r0 = np.zeros(n)
    for s in seeds:
        r0[idx[s]] = 1.0 / len(seeds)
    r = r0.copy()
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        r = (1 - alpha) * r0 + alpha * (P @ r + dangling * r0)
    return {nodes[i]: r[i] for i in range(n) if r[i] > 0}


class TestPPR:
    @pytest.mark.parametrize("seeds", [["a"], ["a", "e"]])
    def test_matches_numpy_power_iteration(self, spark, seeds):
        got = {
            r.node: r.rank
            for r in personalized_pagerank(
                _edges(spark), _seeds(spark, seeds), alpha=0.85, iterations=8
            ).collect()
        }
        want = _ppr_oracle(EDGES, seeds, 0.85, 8)
        assert set(got) == {k for k, v in want.items() if v > 0}
        for node, rank in got.items():
            assert rank == pytest.approx(want[node], rel=1e-9), node

    def test_top_k_excludes_seeds(self, spark):
        top = top_k_expansion(
            _edges(spark), _seeds(spark, ["a"]), 2, iterations=5
        ).collect()
        names = [r.node for r in top]
        assert "a" not in names and len(names) == 2
        assert names[0] == "b"  # nearest neighbor ranks highest

    def test_top_k_plan_is_distributed(self, spark):
        # global top-k must compile to TakeOrderedAndProject (per-
        # partition heaps), never a single-partition window Exchange
        df = top_k_expansion(_edges(spark), _seeds(spark, ["a"]), 2, iterations=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "SinglePartition" not in plan


class TestTrecSink:
    def test_line_format(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 1, 0.9), (1, 11, 2, 0.5)], "qid int, pid int, rank int, score double"
        )
        lines = [r.line for r in to_trec(df).collect()]
        assert lines == ["1 Q0 10 1 0.9 cel_spark", "1 Q0 11 2 0.5 cel_spark"]
