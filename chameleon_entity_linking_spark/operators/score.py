"""Scoring stage: batched pairwise match scoring -> edges.

The rerank analogue (`BiEncoder/test.py:111-120`,
`CrossEncoder/test.py:98-100`): candidate pairs are joined to both
documents' features and scored in Arrow-batched pandas UDFs, then the
reference's weighted mix is applied —
``0.9 * text + 0.1 * entity`` (`BiEncoder/test.py:120`), where our
text score blends Jaro-Winkler + Levenshtein-ratio on the name span,
token Jaccard, and embedding cosine, and the entity score is exact
media_ref Jaccard (the entity-title analogue).

Physical shape: two hash joins on doc_id (pairs -> features for each
side; the feature table is re-read, so callers should persist it),
then map-only scoring. Cheap set ops (token/media Jaccard) stay
JVM-side via ``array_intersect``/``array_union``; only name strings
and embeddings cross into Python, batched.
"""

from __future__ import annotations

import numpy as np
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
    ):
        self.w_jw = w_jw
        self.w_lev = w_lev
        self.w_tok = w_tok
        self.w_cos = w_cos
        self.w_text = w_text
        self.w_media = w_media
        self.threshold = threshold
        self.max_name_chars = max_name_chars

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

    @F.pandas_udf("double")
    def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.zeros(0))
        ma = np.asarray([np.asarray(v, dtype=np.float64) for v in a])
        mb = np.asarray([np.asarray(v, dtype=np.float64) for v in b])
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(
            np.where(den == 0, 0.0, num / np.where(den == 0, 1.0, den))
        )

    return jw_udf, lev_ratio_udf, cosine_udf


def _features(doc_norm: DataFrame, side: str) -> DataFrame:
    return doc_norm.select(
        F.col("doc_id").alias(f"doc_{side}"),
        F.col("name_text").alias(f"name_{side}"),
        F.col("tokens").alias(f"tokens_{side}"),
        F.col("media_refs").alias(f"media_{side}"),
        F.col("embedding").alias(f"emb_{side}"),
    )


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def score_pairs(
    pairs: DataFrame, doc_norm: DataFrame, cfg: ScoreConfig
) -> DataFrame:
    """pairs(doc_a, doc_b) + doc_norm -> scored pairs with components.

    Returns (doc_a, doc_b, s_jw, s_lev, s_tok, s_cos, s_media, score).
    """
    jw_udf, lev_ratio_udf, cosine_udf = _make_udfs()
    joined = pairs.join(_features(doc_norm, "a"), "doc_a").join(
        _features(doc_norm, "b"), "doc_b"
    )
    # JVM-side truncation: bounds the quadratic kernels AND the Arrow
    # transfer size before anything reaches Python
    joined = joined.withColumn(
        "name_a", F.substring("name_a", 1, cfg.max_name_chars)
    ).withColumn("name_b", F.substring("name_b", 1, cfg.max_name_chars))
    # Explicit repartition before the Python stage: AQE coalesces the
    # join output by *bytes* (fine for JVM ops), but pandas-UDF cost is
    # per-row CPU — a byte-coalesced single partition would serialize
    # the whole scoring pass onto one core.
    spark = pairs.sparkSession
    joined = joined.repartition(spark.sparkContext.defaultParallelism)
    text_score = (
        cfg.w_jw * F.col("s_jw")
        + cfg.w_lev * F.col("s_lev")
        + cfg.w_tok * F.col("s_tok")
        + cfg.w_cos * F.col("s_cos")
    )
    has_media = (F.size("media_a") > 0) | (F.size("media_b") > 0)
    scored = (
        joined.withColumn("s_jw", jw_udf("name_a", "name_b"))
        .withColumn("s_lev", lev_ratio_udf("name_a", "name_b"))
        .withColumn("s_tok", _jaccard(F.col("tokens_a"), F.col("tokens_b")))
        .withColumn("s_cos", cosine_udf("emb_a", "emb_b"))
        .withColumn("s_media", _jaccard(F.col("media_a"), F.col("media_b")))
        .withColumn("text_score", text_score)
        .withColumn(
            "score",
            F.when(
                has_media,
                cfg.w_text * F.col("text_score") + cfg.w_media * F.col("s_media"),
            ).otherwise(F.col("text_score")),
        )
    )
    return scored.select(
        "doc_a", "doc_b", "s_jw", "s_lev", "s_tok", "s_cos", "s_media", "score"
    )


def edges_above_threshold(scored: DataFrame, cfg: ScoreConfig) -> DataFrame:
    """rho-style threshold filter (`utils/entity_extractor.py:32`)."""
    return scored.where(F.col("score") >= cfg.threshold).select(
        "doc_a", "doc_b", "score"
    )
