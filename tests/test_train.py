"""B4 training surface: distributed triple assembly + mix-weight GD.

The trainer's correctness gate is exact-math parity with an
independent single-node numpy implementation (same iteration count,
same clamped log-loss) — the analogue of the CC operator's union-find
oracle. The assembly query additionally has a full DuckDB oracle in
the driver registry (training_triples)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chameleon_entity_linking_spark.operators.train import (
    calibrate_mix,
    fit_logistic_weights,
    fit_logistic_weights_numpy,
    margin_mse_triples,
    mix_weight_training_set,
)


def _toy_vectors(n_q=3, n_c=12, dim=8, seed=5):
    rng = np.random.RandomState(seed)
    v = rng.randn(n_q + n_c, dim)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v[:n_q], v[n_q:]


class TestMarginMseTriples:
    def test_matches_brute_force(self, spark):
        qv, cv = _toy_vectors()
        q = spark.createDataFrame(
            [(i, [float(x) for x in qv[i]]) for i in range(len(qv))],
            "id long, embedding array<double>",
        )
        c = spark.createDataFrame(
            [(100 + i, [float(x) for x in cv[i]]) for i in range(len(cv))],
            "id long, embedding array<double>",
        )
        got = {
            (r.qid, r.pos_id, r.neg_id, r.neg_rank): r.margin
            for r in margin_mse_triples(q, c, num_negs=4).collect()
        }
        # independent derivation: numpy cosine, same rounding
        cos = np.round(qv @ cv.T, 6)
        want = {}
        for qi in range(len(qv)):
            order = sorted(
                range(len(cv)), key=lambda j: (-cos[qi, j], 100 + j)
            )
            pos = order[0]
            for rank, j in enumerate(order[1:5], start=1):
                want[(qi, 100 + pos, 100 + j, rank)] = round(
                    float(cos[qi, pos] - cos[qi, j]), 6
                )
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6)

    def test_max_triples_cap_is_deterministic_prefix(self, spark):
        qv, cv = _toy_vectors()
        q = spark.createDataFrame(
            [(i, [float(x) for x in qv[i]]) for i in range(len(qv))],
            "id long, embedding array<double>",
        )
        c = spark.createDataFrame(
            [(100 + i, [float(x) for x in cv[i]]) for i in range(len(cv))],
            "id long, embedding array<double>",
        )
        full = margin_mse_triples(q, c, num_negs=4).orderBy(
            "qid", "neg_rank"
        )
        capped = margin_mse_triples(q, c, num_negs=4, max_triples=7)
        assert capped.count() == 7
        assert sorted(
            map(tuple, capped.collect())
        ) == sorted(map(tuple, full.limit(7).collect()))

    def test_num_negs_bound(self, spark):
        qv, cv = _toy_vectors()
        q = spark.createDataFrame(
            [(0, [float(x) for x in qv[0]])],
            "id long, embedding array<double>",
        )
        c = spark.createDataFrame(
            [(100 + i, [float(x) for x in cv[i]]) for i in range(len(cv))],
            "id long, embedding array<double>",
        )
        out = margin_mse_triples(q, c, num_negs=2).collect()
        assert len(out) == 2
        assert all(r.margin >= 0 for r in out)  # pos is rank-1


class TestFitLogisticWeights:
    def _training_frame(self, spark, n=400, seed=11):
        rng = np.random.RandomState(seed)
        y = (rng.rand(n) < 0.5).astype(float)
        # separable-ish: feature means shift with the class
        x1 = rng.randn(n) * 0.4 + y * 1.5
        x2 = rng.randn(n) * 0.4 - y * 0.8
        df = spark.createDataFrame(
            [
                (float(a), float(b), float(c))
                for a, b, c in zip(x1, x2, y)
            ],
            "f1 double, f2 double, y double",
        )
        X = np.stack([x1, x2], axis=1)
        return df, X, y

    def test_matches_numpy_oracle(self, spark):
        df, X, y = self._training_frame(spark)
        got, hist = fit_logistic_weights(
            df, ["f1", "f2"], label_col="y", iters=25, lr=1.5
        )
        w, b, hist_np = fit_logistic_weights_numpy(
            X, y, iters=25, lr=1.5
        )
        assert got["bias"] == pytest.approx(b, abs=1e-8)
        assert got["f1"] == pytest.approx(w[0], abs=1e-8)
        assert got["f2"] == pytest.approx(w[1], abs=1e-8)
        assert hist == pytest.approx(hist_np, abs=1e-8)
        # loss decreased — GD actually trained
        assert hist[-1] < hist[0]

    def test_l2_matches_numpy(self, spark):
        df, X, y = self._training_frame(spark, seed=13)
        got, _ = fit_logistic_weights(
            df, ["f1", "f2"], label_col="y", iters=10, lr=1.0, l2=0.05
        )
        w, b, _ = fit_logistic_weights_numpy(
            X, y, iters=10, lr=1.0, l2=0.05
        )
        assert got["f1"] == pytest.approx(w[0], abs=1e-8)
        assert got["f2"] == pytest.approx(w[1], abs=1e-8)

    def test_learned_weights_classify(self, spark):
        df, X, y = self._training_frame(spark, n=600, seed=17)
        got, _ = fit_logistic_weights(
            df, ["f1", "f2"], label_col="y", iters=60, lr=2.0
        )
        z = X @ np.array([got["f1"], got["f2"]]) + got["bias"]
        acc = float(((z > 0) == (y > 0.5)).mean())
        assert acc >= 0.95

    def test_empty_training_set_raises(self, spark):
        df = spark.createDataFrame([], "f1 double, y double")
        with pytest.raises(ValueError):
            fit_logistic_weights(df, ["f1"], label_col="y", iters=1)

    def test_iteration_plan_is_pure_jvm(self, spark):
        """The per-iteration aggregation must never drop into a Python
        UDF — BatchEvalPython/ArrowEvalPython in the plan would mean
        per-iteration Python round-trips at corpus scale."""
        df, _, _ = self._training_frame(spark, n=50)
        cached = df.select(
            F.col("f1").cast("double"),
            F.col("f2").cast("double"),
            F.col("y").alias("_y"),
        )
        margin = F.lit(0.1) + F.lit(0.2) * F.col("f1") + F.lit(
            -0.3
        ) * F.col("f2")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        agg = cached.agg(
            F.sum(p - F.col("_y")).alias("g0"),
            F.sum((p - F.col("_y")) * F.col("f1")).alias("g1"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "HashAggregate" in plan  # map-side partial aggregation


class TestMixWeightTrainingSet:
    def test_join_shape_and_labels(self, spark):
        scored = spark.createDataFrame(
            [
                ("a", "b", 0.9, 0.8, 0.7, 0.6, 0.0),
                ("a", "c", 0.2, 0.1, 0.0, 0.3, 0.0),
                ("x", "y", 0.5, 0.5, 0.5, 0.5, 1.0),
            ],
            "doc_a string, doc_b string, s_jw double, s_lev double,"
            " s_tok double, s_cos double, s_media double",
        )
        labels = spark.createDataFrame(
            [("a", "b", True), ("a", "c", False)],
            "doc_a string, doc_b string, is_match boolean",
        )
        rows = mix_weight_training_set(scored, labels).collect()
        assert len(rows) == 2  # unlabeled pair dropped
        by_y = {r.y: r for r in rows}
        assert by_y[1].s_jw == pytest.approx(0.9)
        assert by_y[0].s_cos == pytest.approx(0.3)

    def test_fits_on_pipeline_features(self, spark):
        """End-to-end tie-in: learned weights on real scored features
        separate duplicate from non-duplicate pairs."""
        rng = np.random.RandomState(3)
        n = 300
        y = (rng.rand(n) < 0.4).astype(float)
        rows = []
        for i, yi in enumerate(y):
            base = 0.85 if yi else 0.35
            feat = np.clip(base + rng.randn(4) * 0.08, 0, 1)
            rows.append(
                (f"d{i}a", f"d{i}b", *map(float, feat), 0.0, bool(yi))
            )
        df = spark.createDataFrame(
            rows,
            "doc_a string, doc_b string, s_jw double, s_lev double,"
            " s_tok double, s_cos double, s_media double, is_match boolean",
        )
        train = mix_weight_training_set(
            df.drop("is_match"), df.select("doc_a", "doc_b", "is_match")
        )
        weights, hist = fit_logistic_weights(
            train,
            ["s_jw", "s_lev", "s_tok", "s_cos", "s_media"],
            iters=40,
            lr=2.0,
        )
        assert hist[-1] < hist[0] * 0.7
        # positive-class features are higher -> learned weights must
        # give duplicates higher scores than non-duplicates
        pdf = train.toPandas()
        z = (
            weights["bias"]
            + pdf[["s_jw", "s_lev", "s_tok", "s_cos", "s_media"]]
            @ np.array(
                [
                    weights[c]
                    for c in ["s_jw", "s_lev", "s_tok", "s_cos", "s_media"]
                ]
            )
        )
        acc = float(((z > 0) == (pdf["y"] > 0.5)).mean())
        assert acc >= 0.97


class TestCandidateBoundedTriples:
    def test_candidates_restrict_scoring(self, spark):
        """Scale path: with a candidate pair table, only listed pairs
        are scored (retrieve-then-rank bound) — the triples equal the
        brute-force ones computed over the candidate subset."""
        qv, cv = _toy_vectors()
        q = spark.createDataFrame(
            [(i, [float(x) for x in qv[i]]) for i in range(len(qv))],
            "id long, embedding array<double>",
        )
        c = spark.createDataFrame(
            [(100 + i, [float(x) for x in cv[i]]) for i in range(len(cv))],
            "id long, embedding array<double>",
        )
        # candidates: even corpus ids only
        cand = spark.createDataFrame(
            [(qi, 100 + j) for qi in range(len(qv))
             for j in range(len(cv)) if j % 2 == 0],
            "qid long, cid long",
        )
        got = sorted(
            map(tuple, margin_mse_triples(
                q, c, num_negs=3, candidates=cand).collect())
        )
        cos = np.round(qv @ cv.T, 6)
        want = []
        for qi in range(len(qv)):
            evens = [j for j in range(len(cv)) if j % 2 == 0]
            order = sorted(evens, key=lambda j: (-cos[qi, j], 100 + j))
            pos = order[0]
            for rank, j in enumerate(order[1:4], start=1):
                want.append(
                    (qi, 100 + pos, 100 + j, rank,
                     round(float(cos[qi, pos] - cos[qi, j]), 6))
                )
        assert [t[:4] for t in got] == [t[:4] for t in sorted(want)]


class TestCalibrateMix:
    def test_calibrate_recovers_operating_point(self, spark, tmp_path):
        """End-to-end: run the small pipeline, calibrate the mix on
        the committed scores+labels, and check the calibrated
        hyperplane classifies the labeled scored pairs at least as
        well as chance-free separation requires (pair-level F1)."""
        from chameleon_entity_linking_spark.plans.pipeline import Pipeline
        from chameleon_entity_linking_spark.sources.synth import SynthConfig

        pipe = Pipeline(
            spark,
            str(tmp_path / "wh"),
            synth_cfg=SynthConfig(n_entities=150, seed=9),
        )
        pipe.run(evaluate=False)
        scored = pipe.catalog.read(spark, "scores")
        labels = pipe.catalog.read(spark, "labels")
        w, thr = calibrate_mix(scored, labels, iters=40, lr=2.0)
        assert all(v >= 0.0 for v in w.values())
        assert sum(w.values()) == pytest.approx(1.0, abs=1e-9)
        # pair-level F1 of the calibrated mix on the labeled pairs
        feats = ["s_jw", "s_lev", "s_tok", "s_cos", "s_media"]
        pdf = scored.join(labels, ["doc_a", "doc_b"]).select(
            *feats, F.col("is_match").cast("int").alias("y")
        ).toPandas()
        z = sum(w[c] * pdf[c] for c in feats)
        pred = (z >= thr).astype(int)
        tp = int(((pred == 1) & (pdf["y"] == 1)).sum())
        fp = int(((pred == 1) & (pdf["y"] == 0)).sum())
        fn = int(((pred == 0) & (pdf["y"] == 1)).sum())
        prec = tp / (tp + fp) if tp + fp else 1.0
        rec = tp / (tp + fn) if tp + fn else 1.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        assert f1 >= 0.98

    def test_degenerate_labels_raise(self, spark):
        scored = spark.createDataFrame(
            [("a", "b", 0.9, 0.9, 0.9, 0.9, 0.0),
             ("c", "d", 0.1, 0.1, 0.1, 0.1, 0.0)],
            "doc_a string, doc_b string, s_jw double, s_lev double,"
            " s_tok double, s_cos double, s_media double",
        )
        # inverted labels: high-similarity pair is a non-match ->
        # every informative weight trains negative -> degenerate
        labels = spark.createDataFrame(
            [("a", "b", False), ("c", "d", True)],
            "doc_a string, doc_b string, is_match boolean",
        )
        with pytest.raises(ValueError):
            calibrate_mix(scored, labels, iters=25, lr=2.0)


class TestTrainGuards:
    def test_zero_norm_vectors_degrade_to_cosine_zero(self, spark):
        """normalize() emits zero vectors for token-less docs; the
        triple assembler must give them cosine 0.0 (the scoring
        stage's convention), never NULL margins."""
        q = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [1.0, 0.0])],
            "id long, embedding array<double>",
        )
        c = spark.createDataFrame(
            [(10, [0.6, 0.8]), (11, [1.0, 0.0]), (12, [0.0, 0.0])],
            "id long, embedding array<double>",
        )
        rows = margin_mse_triples(q, c, num_negs=2).collect()
        assert all(r.margin is not None for r in rows)
        # zero-norm query: every cosine 0.0 -> margins all 0.0
        zq = [r for r in rows if r.qid == 0]
        assert zq and all(r.margin == 0.0 for r in zq)

    def test_null_training_rows_fail_loud(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0), (None, 0.0), (0.5, 1.0)],
            "f1 double, y double",
        )
        with pytest.raises(ValueError, match="NULL"):
            fit_logistic_weights(df, ["f1"], label_col="y", iters=1)
