"""Training surface (B4): distributed training-set assembly + a
distributed trainer for the engine's own learnable scorer.

The reference trains two torch models on a GPU: a bi-encoder with
MarginMSE loss over (query, positive, negative) triples whose labels
are teacher-score margins (`BiEncoder/train.py:86-131`,
`BiEncoder/model.py:386-427,457-474`), and a cross-encoder on
binary-labeled pairs at a 1:4 positive:negative ratio
(`CrossEncoder/train.py:27,95`). Re-expressed Spark-first, the
capability splits along what actually needs a cluster:

1. **Triple assembly is data-plane work** — the reference builds its
   training set with single-process dict loops over 8.8M passages
   (`BiEncoder/train.py:98-131`): per query, pick a relevant positive
   and up to ``num_negs_per_system`` hard negatives, label each triple
   with the teacher margin ``ce_scores[pos] - ce_scores[neg]``. Here
   that is :func:`margin_mse_triples` — a broadcast join + window
   rank over candidate pairs. At scale the candidate set comes from
   the blocking/ANN family (the ``candidates`` parameter), so the
   per-query window ranks ~num_negs·probe-width rows, not the
   corpus.

2. **Gradient descent on the deep encoder is GPU work** the sandbox
   cannot run (no torch) and Spark should not re-implement. The
   engine's own trainable scorer is its weighted feature mix
   (`ScoreConfig.w_*`, the analogue of the reference's learned rerank
   score — scoring docstring) — and THAT trains distributed here:
   :func:`fit_logistic_weights` runs full-batch logistic-regression
   gradient descent as ONE Spark aggregation job per iteration, all
   gradient arithmetic in JVM expressions (no Python UDF on the hot
   path — the exact discipline G3's PPR iteration established).

At 10^12 docs the triple table is the big object (corpus-sized); the
trainer's per-iteration traffic is one ~(k+2)-double row back to the
driver, so iterations scale with executors like any map-side-combined
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def margin_mse_triples(
    queries: DataFrame,
    corpus: DataFrame,
    num_negs: int = 4,
    max_triples: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Assemble MarginMSE training triples from embedding tables.

    ``queries``/``corpus``: (id, embedding) — any unit-or-zero-norm
    float vectors. Per query the top-1 corpus vector by cosine is the
    positive (the qrels analogue) and ranks 2..num_negs+1 are the hard
    negatives — the distributed rendition of the reference's
    per-system negative loop capped at ``num_negs_per_system=4``
    (`BiEncoder/train.py:23,115-124`). The label is the teacher-score
    margin ``cos(q,pos) - cos(q,neg)``
    (`BiEncoder/model.py:426-428`); the ``max_triples`` cap is the
    ``max_passages``-style bound (`BiEncoder/train.py:21,98`),
    deterministic (ordered by qid, rank), not a sample.

    Scale shape: queries broadcast (training query sets are ~1e5-1e6
    rows — tiny next to a 10^12-doc corpus). The default exhaustive
    query×corpus scoring is the FAISS-IndexFlat analogue
    (`BiEncoder/test_retrieval.py:51`) — exact, but the top-k window
    SHUFFLES the full Q×N scored product (20B/row after projection):
    correct to ~1e9 scored pairs, the wrong plan past that. Past
    broadcast/bench scale pass ``candidates``:
    a (qid, cid) pair table from the blocking/ANN family (e.g.
    ``ann_ivf_probe2``'s cell join), and only those pairs are scored
    — the same retrieve-then-rank bound the reference's top-1000
    truncation applies, and no cross join ever materializes. Output
    columns: (qid, pos_id, neg_id, neg_rank, margin).
    """
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # norms are per-row constants — compute them BEFORE the pair join
    # (inside it they would be re-evaluated per pair, tripling the
    # arithmetic on the dominant stage)
    q = queries.select(
        F.col(queries.columns[0]).alias("qid"),
        F.col(queries.columns[1]).alias("qv"),
        norm(F.col(queries.columns[1])).alias("qn"),
    )
    c = corpus.select(
        F.col(corpus.columns[0]).alias("cid"),
        F.col(corpus.columns[1]).alias("cv"),
        norm(F.col(corpus.columns[1])).alias("cn"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # zero-norm vectors (normalize() emits them for token-less docs)
    # degrade to cosine 0.0, matching the scoring stage's convention —
    # a bare division would yield NULL (non-ANSI 0/0) and emit
    # NULL-margin training rows silently
    denom = F.col("qn") * F.col("cn")
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(dot / denom)
    if candidates is not None:
        # blocking-family pair streams are NOT deduplicated across
        # keys (expand_key_pairs contract) — a duplicate (qid, cid)
        # would occupy two window ranks, emitting a pos==neg triple
        # with margin 0 and displacing a real hard negative
        paired = (
            candidates.select("qid", "cid")
            .distinct()
            .join(q, "qid")
            .join(c, "cid")
        )
    else:
        paired = F.broadcast(q).crossJoin(c)
    scored = paired.select(
        "qid", "cid", F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    ranked = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= num_negs + 1
    )
    pos = ranked.where(F.col("rank") == 1).select(
        "qid",
        F.col("cid").alias("pos_id"),
        F.col("cosine").alias("pos_cos"),
    )
    neg = ranked.where(F.col("rank") > 1).select(
        "qid",
        F.col("cid").alias("neg_id"),
        (F.col("rank") - 1).alias("neg_rank"),
        F.col("cosine").alias("neg_cos"),
    )
    triples = pos.join(neg, "qid").select(
        "qid",
        "pos_id",
        "neg_id",
        "neg_rank",
        F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
    )
    if max_triples is not None:
        triples = (
            triples.orderBy("qid", "neg_rank").limit(max_triples)
        )
    return triples


def fit_logistic_weights(
    train: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    iters: int = 40,
    lr: float = 2.0,
    l2: float = 0.0,
) -> tuple[dict[str, float], list[float]]:
    """Full-batch logistic regression by distributed gradient descent.

    One Spark aggregation job per iteration: the sigmoid, residual,
    and per-feature gradient products are JVM column expressions, and
    the only bytes that reach the driver per iteration are k+2 doubles
    (k gradients, bias gradient, mean log-loss). Map-side partial
    aggregation makes each iteration's shuffle O(partitions), not
    O(rows) — the textbook scalable shape for a fixed-dimension model
    (the mix has 6 terms; a 10^12-row training table changes the scan
    cost per iteration, not the traffic).

    The learned weights are the engine's rerank-mix analogue of the
    reference's trained scorer (`CrossEncoder/train.py:33` — one
    continuous score in [0,1] from binary-labeled pairs at a capped
    neg ratio); callers feed them back into ``ScoreConfig``.

    Deterministic given the input (full-batch, no sampling; float
    summation order varies with partitioning, so cross-run drift is
    ~1e-12 per iteration — asserted against an independent numpy
    trainer in tests, not hash-compared to SQL).

    Returns ``({"bias": b, <feature>: w, ...}, [loss per iteration])``.
    """
    cached = train.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    ).persist()
    # try/finally: an aggregation failure mid-iteration must not leak
    # the persisted training table (ADVICE r5)
    try:
        any_null = None
        for c in [*feature_cols, "_y"]:
            cond = F.col(c).isNull()
            any_null = cond if any_null is None else (any_null | cond)
        counts = cached.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(any_null.cast("long")).alias("nulls"),
        ).first()
        n = int(counts["n"])
        if n == 0:
            raise ValueError("empty training set")
        if int(counts["nulls"] or 0) > 0:
            # NULLs would silently mis-scale gradients (SUM skips
            # them, the update divides by the full n) — fail loud
            raise ValueError(
                f"{counts['nulls']} training rows have NULL features/labels"
            )
        weights = {c: 0.0 for c in feature_cols}
        bias = 0.0
        history: list[float] = []
        for _ in range(iters):
            margin = F.lit(bias)
            for c in feature_cols:
                margin = margin + F.lit(weights[c]) * F.col(c)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            err = p - F.col("_y")
            # clamped log-loss, same epsilon as the numpy oracle in tests
            eps = 1e-12
            ll = -(
                F.col("_y") * F.log(F.greatest(p, F.lit(eps)))
                + (F.lit(1.0) - F.col("_y"))
                * F.log(F.greatest(F.lit(1.0) - p, F.lit(eps)))
            )
            row = cached.agg(
                F.sum(err).alias("g_bias"),
                *[F.sum(err * F.col(c)).alias(f"g_{c}") for c in feature_cols],
                F.avg(ll).alias("loss"),
            ).first()
            history.append(float(row["loss"]))
            bias -= lr * float(row["g_bias"]) / n
            for c in feature_cols:
                weights[c] -= lr * (
                    float(row[f"g_{c}"]) / n + l2 * weights[c]
                )
    finally:
        cached.unpersist()
    out = {"bias": bias}
    out.update(weights)
    return out, history


def fit_logistic_weights_numpy(
    X, y, iters: int = 40, lr: float = 2.0, l2: float = 0.0
):
    """Single-node reference trainer (same math, numpy) — the parity
    oracle for :func:`fit_logistic_weights`; also usable directly when
    the labeled set already fits in memory."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, k = X.shape
    w = np.zeros(k)
    b = 0.0
    history = []
    eps = 1e-12
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        history.append(
            float(
                -np.mean(
                    y * np.log(np.maximum(p, eps))
                    + (1 - y) * np.log(np.maximum(1 - p, eps))
                )
            )
        )
        err = p - y
        b -= lr * float(err.sum()) / n
        w -= lr * ((X.T @ err) / n + l2 * w)
    return w, b, history


MIX_FEATURES = ["s_jw", "s_lev", "s_tok", "s_cos", "s_media"]


def mix_weight_training_set(
    scored: DataFrame, labels: DataFrame, label_col: str = "is_match"
) -> DataFrame:
    """Join the scoring stage's per-feature columns with labeled pairs
    to produce the mix-weight training table: (s_jw, s_lev, s_tok,
    s_cos, s_media, y). ``labels`` carries canonical (doc_a, doc_b,
    <label_col>) — the synth/pipeline labels table's shape; pairs the
    blocker never generated are absent here — the trainer calibrates
    the mix at the operating point the cascade actually scores, the
    same conditioning the reference's cross-encoder gets from training
    on retrieved (not random) negatives (`CrossEncoder/train.py:60-95`).
    """
    return scored.join(labels, ["doc_a", "doc_b"]).select(
        *MIX_FEATURES,
        F.col(label_col).cast("int").alias("y"),
    )


def calibrate_mix(
    scored: DataFrame,
    labels: DataFrame,
    label_col: str = "is_match",
    iters: int = 40,
    lr: float = 2.0,
) -> tuple[dict[str, float], float]:
    """Learn a ScoreConfig-shaped weight set from labeled scored pairs.

    Fits the logistic mix on the committed ``scores`` table's feature
    columns, then maps the learned hyperplane onto ScoreConfig's
    parameterization: negative weights clamp to 0 (features are
    similarities; a negative learned weight means the feature carries
    no signal at this operating point, and the scoring cascade's
    lossless upper bound requires non-negative weights), the rest
    normalize to sum 1, and the decision boundary ``margin >= -bias``
    maps to ``threshold = -bias / sum(clamped)``. Clamping moves the
    boundary only when a weight was materially negative — the returned
    ``(weights, threshold)`` is a calibration, not an exact re-fit;
    callers should gate it with pairwise_f1 before adopting it (see
    tests/test_train.py::test_calibrate_recovers_operating_point).

    Usage::

        w, thr = calibrate_mix(cat.read(spark, "scores"),
                               cat.read(spark, "labels"))
        cfg = ScoreConfig(w_text=1.0, w_jw=w["s_jw"], w_lev=w["s_lev"],
                          w_tok=w["s_tok"], w_cos=w["s_cos"],
                          w_media=w["s_media"], threshold=thr)
    """
    train = mix_weight_training_set(scored, labels, label_col)
    learned, _hist = fit_logistic_weights(
        train, MIX_FEATURES, iters=iters, lr=lr
    )
    clamped = {c: max(0.0, learned[c]) for c in MIX_FEATURES}
    total = sum(clamped.values())
    if total <= 0:
        raise ValueError(
            "calibration degenerate: every learned weight <= 0 "
            "(labels uninformative at this operating point)"
        )
    weights = {c: v / total for c, v in clamped.items()}
    threshold = -learned["bias"] / total
    return weights, threshold
