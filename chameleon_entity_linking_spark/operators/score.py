"""Scoring stage: lossless JVM cascade -> batched pairwise scoring.

The rerank analogue (`BiEncoder/test.py:111-120`,
`CrossEncoder/test.py:98-100`): candidate pairs are joined to both
documents' features and scored, then the reference's weighted mix is
applied — ``0.9 * text + 0.1 * entity`` (`BiEncoder/test.py:120`),
where the text score blends Jaro-Winkler + Levenshtein-ratio on the
name span, token Jaccard, and embedding cosine, and the entity score
is exact media_ref Jaccard (the entity-title analogue).

**Cascade (the scale-critical part).** Multi-key blocking at high
fan-out emits ~100 candidates/doc, ~98% junk. Scoring is therefore a
three-phase cascade, each phase shuffling less data than it rules out:

1. **Sketch prefilter (compact shuffle).** The pairs table joins only
   the int8-quantized embedding sketch ``emb_q`` (64B) + media_refs
   per side — NOT the full feature row. Estimated cosine (int8 dot,
   error <= ~0.02 for unit vectors) below
   ``prefilter_min_cheap - margin``, with no media on either side,
   cannot survive the later phases -> dropped. Measured effect: the
   wide-feature shuffle shrinks from ~30GB to ~2GB at 18M pairs.
2. **Exact cheap components (JVM, survivors only).** Full features
   join the (small) survivor set; token/media Jaccard + exact float
   dot (cosine: encoder vectors are unit-norm or zero) re-check the
   prefilter exactly and apply the *lossless* upper bound
   ``upper = w_text*(w_jw + w_lev + w_tok*s_tok + w_cos*s_cos)
   [+ w_media*s_media]`` — a pair with ``upper < threshold`` cannot
   clear the final threshold whatever JW/Levenshtein say.
3. **Arrow rerank (Python, final survivors).** Batched
   JW/Levenshtein on name spans, weighted mix, threshold.

Same retrieve-then-rerank shape as the reference
(`BiEncoder/test_retrieval.py` recall stage -> `BiEncoder/test.py`
rerank), with each hop bounded by the previous one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chameleon_entity_linking_spark.functions.strsim import (
    jaro_winkler_batch,
    levenshtein_ratio_batch,
)


class ScoreConfig:
    def __init__(
        self,
        w_jw: float = 0.35,
        w_lev: float = 0.25,
        w_tok: float = 0.2,
        w_cos: float = 0.2,
        w_text: float = 0.9,
        w_media: float = 0.1,
        # calibrated on the synthetic fixture (cluster-level F1 sweep;
        # the pinned-threshold analogue of the reference's rho=0.26,
        # utils/entity_extractor.py:10): transitive closure recovers
        # borderline true pairs, so a precision-leaning cut wins
        threshold: float = 0.62,
        # cap on name-span chars entering the O(n^2) string kernels —
        # bounds per-pair cost (the truncation analogue of the
        # reference's max_length=512 tokenizer cap,
        # BiEncoder/model.py:46-47)
        max_name_chars: int = 100,
        # lossless-cascade switch (off only for diagnostics: scores of
        # pruned pairs are never needed — they cannot clear threshold)
        cascade: bool = True,
        # calibrated lossy prefilter on embedding cosine: pairs below
        # it (and without media on either side) skip the expensive
        # rerank. Cosine-based so the int8 sketch phase can bound it
        # with a fixed quantization margin. The bounded-candidates
        # tradeoff of the reference's top-1000 truncation — pinned
        # here, guarded by the F1 >= 0.99 gate in tests. None disables.
        prefilter_min_cheap: float | None = 0.30,
    ):
        self.w_jw = w_jw
        self.w_lev = w_lev
        self.w_tok = w_tok
        self.w_cos = w_cos
        self.w_text = w_text
        self.w_media = w_media
        self.threshold = threshold
        self.max_name_chars = max_name_chars
        self.cascade = cascade
        self.prefilter_min_cheap = prefilter_min_cheap

    def fingerprint(self) -> dict:
        return dict(vars(self))


def _make_udfs():
    # built lazily: pandas_udf parses its DDL against the active session
    @F.pandas_udf("double")
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(jaro_winkler_batch(a.tolist(), b.tolist()))

    @F.pandas_udf("double")
    def lev_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(levenshtein_ratio_batch(a.tolist(), b.tolist()))

    return jw_udf, lev_ratio_udf


def _features(doc_norm: DataFrame, side: str) -> DataFrame:
    # emb_q (64B int8), not the float embedding: cosine is computed in
    # int8 throughout scoring (error <= ~0.02; the pinned threshold is
    # calibrated with it, F1-gate-guarded) so the widest feature never
    # joins the pair stream
    return doc_norm.select(
        F.col("doc_id").alias(f"doc_{side}"),
        F.col("name_text").alias(f"name_{side}"),
        F.col("tokens").alias(f"tokens_{side}"),
        F.col("media_refs").alias(f"media_{side}"),
        F.col("emb_q").alias(f"q_{side}"),
    )


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def _dot_q(a, b):
    """JVM-side int8 dot -> cosine estimate in [-1, 1] for unit-norm
    (or zero) source vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("int") * y.cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(127.0 * 127.0)


def _sketch(doc_norm: DataFrame, side: str) -> DataFrame:
    return doc_norm.select(
        F.col("doc_id").alias(f"doc_{side}"),
        F.col("emb_q").alias(f"q_{side}"),
        # text-free media doc: the only case where a pair can match
        # with no lexical signal at all (judged purely on media)
        ((F.size("media_refs") > 0) & (F.size("tokens") == 0)).alias(
            f"mediaonly_{side}"
        ),
    )


def sketch_prefilter(
    pairs: DataFrame, doc_norm: DataFrame, cfg: ScoreConfig
) -> DataFrame:
    """Phase 1: drop pairs below the cosine prefilter. Scoring uses the
    same int8 dot, so this phase is *bit-exact* with the prefilter the
    exact phase re-applies — no margin, no approximation gap."""
    if cfg.prefilter_min_cheap is None or not cfg.cascade:
        return pairs
    joined = pairs.join(_sketch(doc_norm, "a"), "doc_a").join(
        _sketch(doc_norm, "b"), "doc_b"
    )
    # media *presence* is no pass — ~all docs can carry media; only a
    # text-free media doc is exempt from the lexical cut (its match
    # signal is media overlap alone)
    keep = (
        F.col("mediaonly_a")
        | F.col("mediaonly_b")
        | (_dot_q(F.col("q_a"), F.col("q_b")) >= F.lit(cfg.prefilter_min_cheap))
    )
    return joined.where(keep).select("doc_a", "doc_b")


def score_pairs(
    pairs: DataFrame, doc_norm: DataFrame, cfg: ScoreConfig,
    presketched: bool = False,
) -> DataFrame:
    """pairs(doc_a, doc_b) + doc_norm -> scored pairs with components.

    Returns (doc_a, doc_b, s_jw, s_lev, s_tok, s_cos, s_media, score).
    With ``cfg.cascade`` (default) only pairs whose upper-bound score
    can reach ``cfg.threshold`` are emitted — callers filtering at
    ``threshold`` (``edges_above_threshold``) see identical results.
    """
    jw_udf, lev_ratio_udf = _make_udfs()
    if not presketched:  # set by callers that ran sketch_prefilter themselves
        pairs = sketch_prefilter(pairs, doc_norm, cfg)
    joined = pairs.join(_features(doc_norm, "a"), "doc_a").join(
        _features(doc_norm, "b"), "doc_b"
    )
    # ---- cheap JVM components ------------------------------------------
    has_media = (F.size("media_a") > 0) | (F.size("media_b") > 0)
    # encoder vectors are unit-norm or zero => cosine == dot, and the
    # zero-vector case degrades to 0.0 on its own
    cheap = (
        joined.withColumn("s_tok", _jaccard(F.col("tokens_a"), F.col("tokens_b")))
        .withColumn("s_cos", _dot_q(F.col("q_a"), F.col("q_b")))
        .withColumn("s_media", _jaccard(F.col("media_a"), F.col("media_b")))
        .withColumn("has_media", has_media)
    )
    if cfg.cascade:
        cheap_text_max = (
            cfg.w_jw + cfg.w_lev + cfg.w_tok * F.col("s_tok") + cfg.w_cos * F.col("s_cos")
        )
        no_text = (F.size("tokens_a") == 0) & (F.size("tokens_b") == 0)
        upper = F.when(
            no_text & F.col("has_media"), F.col("s_media")
        ).when(
            F.col("has_media"),
            cfg.w_text * cheap_text_max + cfg.w_media * F.col("s_media"),
        ).otherwise(cheap_text_max)
        cheap = cheap.where(upper >= cfg.threshold)
        if cfg.prefilter_min_cheap is not None:
            mediaonly = ((F.size("media_a") > 0) & (F.size("tokens_a") == 0)) | (
                (F.size("media_b") > 0) & (F.size("tokens_b") == 0)
            )
            cheap = cheap.where(
                (F.col("s_cos") >= cfg.prefilter_min_cheap) | mediaonly
            )
    # ---- expensive Python components on survivors only -----------------
    # JVM-side truncation bounds the quadratic kernels AND the Arrow
    # transfer; explicit repartition because AQE coalesces by bytes
    # while pandas-UDF cost is per-row CPU
    spark = pairs.sparkSession
    survivors = (
        cheap.withColumn("name_a", F.substring("name_a", 1, cfg.max_name_chars))
        .withColumn("name_b", F.substring("name_b", 1, cfg.max_name_chars))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("s_jw", jw_udf("name_a", "name_b"))
        .withColumn("s_lev", lev_ratio_udf("name_a", "name_b"))
    )
    text_score = (
        cfg.w_jw * F.col("s_jw")
        + cfg.w_lev * F.col("s_lev")
        + cfg.w_tok * F.col("s_tok")
        + cfg.w_cos * F.col("s_cos")
    )
    no_text = (F.size("tokens_a") == 0) & (F.size("tokens_b") == 0)
    scored = survivors.withColumn("text_score", text_score).withColumn(
        "score",
        # media-only pairs (no text on either side) are judged purely
        # on media overlap — otherwise the empty text components would
        # drown an exact media match below any threshold
        F.when(no_text & F.col("has_media"), F.col("s_media"))
        .when(
            F.col("has_media"),
            cfg.w_text * F.col("text_score") + cfg.w_media * F.col("s_media"),
        )
        .otherwise(F.col("text_score")),
    )
    return scored.select(
        "doc_a", "doc_b", "s_jw", "s_lev", "s_tok", "s_cos", "s_media", "score"
    )


def edges_above_threshold(scored: DataFrame, cfg: ScoreConfig) -> DataFrame:
    """rho-style threshold filter (`utils/entity_extractor.py:32`)."""
    return scored.where(F.col("score") >= cfg.threshold).select(
        "doc_a", "doc_b", "score"
    )
