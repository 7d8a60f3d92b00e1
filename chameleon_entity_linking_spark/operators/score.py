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
        # (Recalibrated twice in round 4 for the vectorized encoder's
        # cosine distribution: the r2-era 0.30 passed +8% junk; the
        # calibration sweep at 100k entities found the edge set and
        # cluster F1 flat all the way to 0.50 — pinned one notch
        # conservative at 0.45: surviving pairs 1.42M -> 0.65M,
        # edges within 0.01%, F1 identical 0.99953.)
        prefilter_min_cheap: float | None = 0.45,
        # phase-0 sign-sketch cut: pairs whose 64-bit embedding sign
        # sketches differ in more than this many bits (and with no
        # media-only side) drop before the int8 dot ever runs — one
        # XOR + popcount per pair on two longs, vs a 64-element array
        # walk. E[hamming] = 64*theta/pi for random projections, so
        # cos >= 0.45 (theta <= 63.3 deg) concentrates below ~11.2
        # bits (sigma ~3.1); the default cut sits ~3 sigma above.
        # Lossy like the cosine cut (a true pair CAN straddle it) —
        # calibrated with the sweep above, guarded by the same F1
        # gate. None disables phase 0 (the dot sees every raw pair).
        prefilter_max_hamming: int | None = 21,
        # W5 length-sorted batching (`BiEncoder/model.py:99-100`): sort
        # within partitions by name length before the string-kernel
        # UDFs so each Arrow batch pads to its own (short) max length —
        # the batched 2-D kernels' work scales with batch max length.
        # No shuffle (sortWithinPartitions); order-insensitive output.
        length_sort: bool = True,
        # broadcast the (doc_id, emb_q, media-only) sketch table into
        # the prefilter joins: 70B/doc, so it broadcasts comfortably
        # to ~10^8 docs. Planner size estimates come from the FULL
        # doc_norm parquet (wide embedding/spans columns), so without
        # the hint the 20x-larger raw pair stream gets shuffled
        # instead (measured: +30s at 193k docs). Set False past
        # broadcast scale — the prefilter then shuffle-joins, which is
        # still one shuffle of the raw stream vs two of the deduped.
        broadcast_sketch: bool = True,
        # fuse the phase-0 sign sketch INTO the pair expansion
        # (block.expand_key_pairs sketch=): members group as
        # (doc_id, sig, mediaonly) structs, so the hamming cut runs
        # inline in the explode stage with no joins over the raw pair
        # stream. WINS when raw pairs >> key rows (measured 45x at the
        # sf1.0 flagship corpus); the ~17B/row widening of the
        # key->grouped shuffle can cost more than the removed probes
        # when the ratio is near 1 (the dense-key bench corpus), so
        # the default stays off and the flagship config opts in.
        sketch_inline: bool = False,
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
        self.prefilter_max_hamming = prefilter_max_hamming
        self.length_sort = length_sort
        self.broadcast_sketch = broadcast_sketch
        self.sketch_inline = sketch_inline

    @property
    def sketch_fused(self) -> bool:
        """True iff pair generation fuses the sketch prefilter (and
        therefore emits pre-sketched pairs carrying ``s_cos``). THE
        single definition — block.candidate_pairs decides whether to
        attach sketches with this, and every caller passing
        ``presketched=`` to score_pairs must read the same flag, or a
        drift leaves one side expecting columns the other didn't
        build."""
        return self.cascade and self.prefilter_min_cheap is not None

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


def _features(
    doc_norm: DataFrame, side: str, max_name_chars: int | None = None
) -> DataFrame:
    # hashed token/media sets (not the strings): the per-pair set
    # intersections run on int64 (2.4x cheaper, measured) and the
    # feature row is narrower through the pair join. emb_q (64B int8),
    # not the float embedding: cosine is computed in int8 throughout
    # scoring (error <= ~0.02; the pinned threshold is calibrated with
    # it, F1-gate-guarded) so the widest feature never joins the pair
    # stream. Names truncate HERE, before the feature shuffle (the
    # string kernels cap at max_name_chars anyway — shuffling the tail
    # would be pure wasted bytes).
    name = F.col("name_text")
    if max_name_chars is not None:
        name = F.substring(name, 1, max_name_chars)
    return doc_norm.select(
        F.col("doc_id").alias(f"doc_{side}"),
        name.alias(f"name_{side}"),
        F.col("tokens_h").alias(f"tokens_{side}"),
        F.col("media_h").alias(f"media_{side}"),
        F.col("emb_q").alias(f"q_{side}"),
    )


def _name_features(
    doc_norm: DataFrame, side: str, max_name_chars: int | None
) -> DataFrame:
    """(doc_{side}, name_{side}) only — joined to cheap-phase
    SURVIVORS, so the 100-char names never ride the full pair stream
    (r6, guide §2.3: the cheap phase decides on set/sketch features
    alone; measured at sf1.0 the names were ~40% of the bytes flowing
    through the 22.5M-pair cheap projection)."""
    name = F.col("name_text")
    if max_name_chars is not None:
        name = F.substring(name, 1, max_name_chars)
    return doc_norm.select(
        F.col("doc_id").alias(f"doc_{side}"), name.alias(f"name_{side}")
    )


def _jaccard_from_counts(inter, n_a, n_b):
    """Jaccard from an intersect count + per-side DISTINCT sizes:
    |union| = |a| + |b| - |inter| (normalize() array_distincts both
    sides), so the expensive array_union allocation+hash is
    eliminated outright (r6; it was ~half the cheap-phase jaccard
    cost). ``inter`` must be a bound ATTRIBUTE (projected in a prior
    select), not a raw expression — a Column expression referenced
    twice is cloned into the tree and evaluated twice per row. Same
    integers -> same double as the array_union form (union == 0
    implies inter == 0 -> 0.0)."""
    return inter / F.greatest(n_a + n_b - inter, F.lit(1))


def _eval_once(expr):
    """Evaluate-once guard for an expensive aliased expression.

    Catalyst's PushDownPredicate/CollapseProject INLINE a projected
    alias into every consumer (a later filter + the output + each
    score term), and interpreted expressions (higher-order functions,
    array set ops) get no runtime subexpression elimination — measured
    on this pipeline: the jaccard appeared 20x in one optimized plan
    and the exact phase burned ~200us/pair. Wrapping the expression as
    ``shuffle(array(x))[0]`` preserves its value exactly (shuffling a
    1-element array is the identity) but marks it NON-DETERMINISTIC,
    which Catalyst refuses to substitute into predicates or duplicate
    across projections — so the column is computed exactly once and
    every consumer reads the stored value.
    """
    return F.get(F.shuffle(F.array(expr)), 0)


def _dot_q(a, b):
    """JVM-side int8 dot -> cosine estimate in [-1, 1] for unit-norm
    (or zero) source vectors. (Interpreted HOF fold — correct at any
    dim, but ~12us/pair; the pair-stream hot path uses
    :func:`_int8_dot_udf` instead, measured 3-6x faster per pair
    including the Arrow transfer. An unrolled 64-term GetArrayItem
    codegen expression was ALSO measured — slower than this fold —
    so the vectorized-numpy route is the fast path, guide §4.2.)"""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("int") * y.cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(127.0 * 127.0)


def _int8_dot_udf():
    """Arrow-batched int8 dot (guide §4.2): whole batches of emb_q
    sketch pairs hand to one ``np.einsum`` per batch — exact integer
    arithmetic (int32 accumulators, max |sum| = 64 * 127^2), then the
    same /127^2 division as :func:`_dot_q`, so the cosine estimate is
    BIT-IDENTICAL to the JVM fold (sum-equality asserted in
    tests/test_score.py). Marked non-deterministic so the optimizer
    never duplicates the Python stage below a filter consuming its
    output (guide §4.4) — the value is deterministic.
    """
    import numpy as np

    @F.pandas_udf("double")
    def int8_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av = np.stack(a.values).astype(np.int32)
        bv = np.stack(b.values).astype(np.int32)
        return pd.Series(np.einsum("ij,ij->i", av, bv) / (127.0 * 127.0))

    return int8_dot.asNondeterministic()


def _mediaonly():
    """THE media-only predicate: a text-free media doc is the one
    case where a pair can match with no lexical signal at all (judged
    purely on media). Single definition — phase 0, phase 1, and any
    future exemption must agree or pairs get dropped in one phase and
    kept in another."""
    return (F.size("media_refs") > 0) & (F.size("tokens") == 0)


def _sketch(
    doc_norm: DataFrame, side: str, sig: bool = False
) -> DataFrame:
    cols = [
        F.col("doc_id").alias(f"doc_{side}"),
        _mediaonly().alias(f"mediaonly_{side}"),
    ]
    cols.insert(
        1,
        F.col("emb_sig").alias(f"sig_{side}")
        if sig
        else F.col("emb_q").alias(f"q_{side}"),
    )
    return doc_norm.select(*cols)


def sketch_prefilter(
    pairs: DataFrame, doc_norm: DataFrame, cfg: ScoreConfig
) -> DataFrame:
    """Drop pairs below the cosine prefilter, in two sketch phases.

    Phase 0 (sign sketch, 9B/side): pairs whose 64-bit embedding
    SIGN sketches (``emb_sig``) differ in more than
    ``prefilter_max_hamming`` bits drop on one XOR + popcount — pure
    whole-stage-codegen integer ops. This is where the bulk of the
    raw pair stream dies, at a fraction of the per-pair memory
    traffic of the array dot (the C=8 DRAM-saturation fix: the
    expansion+prefilter stage's bytes touched per raw pair fall from
    ~2x64B arrays + interpreted HOF allocations to two longs).

    Phase 1 (int8 dot, survivors only): the exact int8-dot cosine.
    Scoring re-applies this same cut bit-exactly downstream.

    Output carries ``s_cos`` (the int8-dot cosine): the dot is the
    most expensive cheap-phase expression (~16us/pair interpreted
    HOF), so downstream scoring reuses this column instead of
    recomputing it per pair.
    """
    if cfg.prefilter_min_cheap is None or not cfg.cascade:
        return pairs
    inline_sig = cfg.prefilter_max_hamming is not None and {
        "sig_a",
        "sig_b",
        "mediaonly_a",
        "mediaonly_b",
    } <= set(pairs.columns)
    use_ham = (
        cfg.prefilter_max_hamming is not None
        and "emb_sig" in doc_norm.columns
    )
    if inline_sig or use_ham:
        ham_cut = F.lit(int(cfg.prefilter_max_hamming))
        if inline_sig:
            # the expansion attached both sides' sketches inline
            # (block.expand_key_pairs sketch=): phase 0 is a plain
            # filter fused into the expansion stage — no joins over
            # the raw pair stream at all (r6)
            ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            pre = pairs.where(
                F.col("mediaonly_a") | F.col("mediaonly_b") | (ham <= ham_cut)
            ).select("doc_a", "doc_b", "mediaonly_a", "mediaonly_b")
        else:
            ga = F.broadcast if cfg.broadcast_sketch else (lambda df: df)
            siga = ga(_sketch(doc_norm, "a", sig=True))
            sigb = ga(_sketch(doc_norm, "b", sig=True))
            ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            pre = (
                pairs.join(siga, "doc_a")
                .join(sigb, "doc_b")
                .where(
                    F.col("mediaonly_a")
                    | F.col("mediaonly_b")
                    | (ham <= ham_cut)
                )
                .select("doc_a", "doc_b", "mediaonly_a", "mediaonly_b")
            )
        qa = doc_norm.select(
            F.col("doc_id").alias("doc_a"), F.col("emb_q").alias("q_a")
        )
        qb = doc_norm.select(
            F.col("doc_id").alias("doc_b"), F.col("emb_q").alias("q_b")
        )
        if cfg.broadcast_sketch:
            qa, qb = F.broadcast(qa), F.broadcast(qb)
        joined = pre.join(qa, "doc_a").join(qb, "doc_b")
    else:
        sa, sb = _sketch(doc_norm, "a"), _sketch(doc_norm, "b")
        if cfg.broadcast_sketch:
            sa, sb = F.broadcast(sa), F.broadcast(sb)
        joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    # vectorized Arrow dot (r6): one numpy einsum per batch instead of
    # an interpreted per-pair fold — measured 3-6x faster per pair on
    # the dominant prefilter stage; nondeterministic marking plays the
    # _eval_once role (computed once, not re-inlined into the filter)
    proj = joined.select(
        "doc_a",
        "doc_b",
        "mediaonly_a",
        "mediaonly_b",
        _int8_dot_udf()(F.col("q_a"), F.col("q_b")).alias("s_cos"),
    )
    # media *presence* is no pass — ~all docs can carry media; only a
    # text-free media doc is exempt from the lexical cut (its match
    # signal is media overlap alone)
    keep = (
        F.col("mediaonly_a")
        | F.col("mediaonly_b")
        | (F.col("s_cos") >= F.lit(cfg.prefilter_min_cheap))
    )
    return proj.where(keep).select("doc_a", "doc_b", "s_cos")


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
    # the prefilter already computed the int8-dot cosine — reuse it
    # instead of re-running the dot per pair (and drop the emb_q
    # sketches from the feature join entirely: narrower pair rows)
    has_cos = "s_cos" in pairs.columns
    fa = _features(doc_norm, "a", cfg.max_name_chars).drop("name_a")
    fb = _features(doc_norm, "b", cfg.max_name_chars).drop("name_b")
    if has_cos:
        fa, fb = fa.drop("q_a"), fb.drop("q_b")
    joined = pairs.join(fa, "doc_a").join(fb, "doc_b")
    # ---- cheap JVM components, each evaluated ONCE (_pin) ---------------
    # encoder vectors are unit-norm or zero => cosine == dot, and the
    # zero-vector case degrades to 0.0 on its own. Sizes/flags are
    # projected out too so the arrays can be dropped here. Names are
    # NOT joined yet (r6): the cheap phase decides on set/sketch
    # features alone, so the truncated names join only the (far
    # smaller) survivor set below instead of riding the full pair
    # stream through the jaccard projection.
    s_cos_col = (
        F.col("s_cos")
        if has_cos
        else _int8_dot_udf()(F.col("q_a"), F.col("q_b"))
    )
    # two-step: intersect counts + sizes bound as attributes first,
    # ratios second — each array_intersect runs exactly once per pair
    # and no array_union runs at all (see _jaccard_from_counts)
    counted = joined.select(
        "doc_a",
        "doc_b",
        F.size("tokens_a").alias("n_tok_a"),
        F.size("tokens_b").alias("n_tok_b"),
        F.size("media_a").alias("n_med_a"),
        F.size("media_b").alias("n_med_b"),
        _eval_once(
            F.size(F.array_intersect("tokens_a", "tokens_b"))
        ).alias("i_tok"),
        s_cos_col.alias("s_cos"),
        _eval_once(
            F.size(F.array_intersect("media_a", "media_b"))
        ).alias("i_med"),
    )
    cheap = counted.select(
        "doc_a",
        "doc_b",
        (F.col("n_tok_a") == 0).alias("no_tok_a"),
        (F.col("n_tok_b") == 0).alias("no_tok_b"),
        (F.col("n_med_a") > 0).alias("has_med_a"),
        (F.col("n_med_b") > 0).alias("has_med_b"),
        _jaccard_from_counts(
            F.col("i_tok"), F.col("n_tok_a"), F.col("n_tok_b")
        ).alias("s_tok"),
        "s_cos",
        _jaccard_from_counts(
            F.col("i_med"), F.col("n_med_a"), F.col("n_med_b")
        ).alias("s_media"),
    )
    has_media = F.col("has_med_a") | F.col("has_med_b")
    no_text = F.col("no_tok_a") & F.col("no_tok_b")
    if cfg.cascade:
        cheap_text_max = (
            cfg.w_jw
            + cfg.w_lev
            + cfg.w_tok * F.col("s_tok")
            + cfg.w_cos * F.col("s_cos")
        )
        upper = (
            F.when(no_text & has_media, F.col("s_media"))
            .when(
                has_media,
                cfg.w_text * cheap_text_max + cfg.w_media * F.col("s_media"),
            )
            .otherwise(cheap_text_max)
        )
        cheap = cheap.where(upper >= cfg.threshold)
        if cfg.prefilter_min_cheap is not None:
            mediaonly = (F.col("has_med_a") & F.col("no_tok_a")) | (
                F.col("has_med_b") & F.col("no_tok_b")
            )
            cheap = cheap.where(
                (F.col("s_cos") >= cfg.prefilter_min_cheap) | mediaonly
            )
    # names join the survivors only (truncated pre-join as before)
    cheap = cheap.join(
        _name_features(doc_norm, "a", cfg.max_name_chars), "doc_a"
    ).join(_name_features(doc_norm, "b", cfg.max_name_chars), "doc_b")
    # ---- expensive Python components on survivors only -----------------
    # names were truncated JVM-side above, bounding the quadratic
    # kernels AND the Arrow transfer; explicit repartition because AQE
    # coalesces by bytes while pandas-UDF cost is per-row CPU
    spark = pairs.sparkSession
    survivors = cheap.repartition(spark.sparkContext.defaultParallelism)
    if cfg.length_sort:
        # W5: length-homogeneous Arrow batches for the 2-D kernels
        survivors = survivors.sortWithinPartitions(F.length("name_a"))
    survivors = survivors.withColumn("s_jw", jw_udf("name_a", "name_b"))
    if cfg.cascade:
        # JW-refined lossless upper bound BETWEEN the two kernels:
        # Jaro-Winkler is O(n) per pair, Levenshtein O(n^2) — so
        # re-apply the cascade bound with the ACTUAL s_jw (s_lev <= 1
        # is the only remaining optimism) and only the survivors pay
        # for the quadratic kernel. On corpora where the cheap
        # set/cosine signals saturate (near-identical vocabularies)
        # this is the phase that separates: measured on the sf0.1
        # flagship, 1.30M cheap-phase survivors -> 22.7k Levenshtein
        # calls, identical edges (the bound is an upper bound, so
        # no pair that could clear the threshold is dropped).
        jw_text_max = (
            cfg.w_jw * F.col("s_jw")
            + cfg.w_lev
            + cfg.w_tok * F.col("s_tok")
            + cfg.w_cos * F.col("s_cos")
        )
        jw_upper = (
            F.when(no_text & has_media, F.col("s_media"))
            .when(
                has_media,
                cfg.w_text * jw_text_max + cfg.w_media * F.col("s_media"),
            )
            .otherwise(jw_text_max)
        )
        survivors = survivors.where(jw_upper >= cfg.threshold)
    survivors = survivors.withColumn("s_lev", lev_ratio_udf("name_a", "name_b"))
    text_score = (
        cfg.w_jw * F.col("s_jw")
        + cfg.w_lev * F.col("s_lev")
        + cfg.w_tok * F.col("s_tok")
        + cfg.w_cos * F.col("s_cos")
    )
    scored = survivors.withColumn("text_score", text_score).withColumn(
        "score",
        # media-only pairs (no text on either side) are judged purely
        # on media overlap — otherwise the empty text components would
        # drown an exact media match below any threshold
        F.when(no_text & has_media, F.col("s_media"))
        .when(
            has_media,
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
