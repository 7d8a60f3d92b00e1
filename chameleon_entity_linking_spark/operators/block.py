"""Blocking stage: salted multi-key candidate-pair generation.

The analogue of the reference's candidate generation — BM25 run files
(`BiEncoder/test.py:63-79`) and FAISS top-k retrieval
(`BiEncoder/test_retrieval.py:51-76`). A global ANN index cannot
exist at 10^12 docs, so candidate generation becomes a
hash-partitioned self-join over three key families:

  t:<token>      tokens of the *name* span (entity-name terms — the
                 BM25-term analogue)
  l:<band>       MinHash-LSH band keys over char-3-shingles of the
                 full normalized text (the dense-recall analogue)
  m:<media_ref>  exact media content hashes (the exact entity-title
                 key analogue, `BiEncoder/model.py:404`)

Skew discipline (north rule: explicit partitioning + skew splitting):
  * keys with one member generate no pairs -> dropped before the join
  * keys with <= ``hot_key_cap`` members self-join directly
  * hotter keys are *salted*: members get a deterministic salt group
    g in [0, s), s = ceil(n/cap), and the classic triangle-join
    replication — a member is LEFT in bucket-pairs (g, j>=g) and
    RIGHT in (i<=g, g) — generates every intra-key pair exactly once
    across buckets, each bucket bounded ~cap members per side
  * keys hotter than ``cap * max_salts`` are dropped and counted in
    metrics (stopword-grade keys; the reference's analogous bound is
    its top-1000 candidate truncation)

Every emitted pair is canonicalized doc_a < doc_b and deduplicated
across key families (SURVEY.md J8).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chameleon_entity_linking_spark.functions.minhash import (
    band_keys_from_signature,
    minhash_fast_batch,
)
from chameleon_entity_linking_spark.functions.tokenize import char_shingles


class BlockConfig:
    def __init__(
        self,
        lsh_hashes: int = 64,
        lsh_bands: int = 16,
        hot_key_cap: int = 64,
        max_salts: int = 16,
        # blocking-QUALITY bound, distinct from the skew bound: a key
        # shared by more docs than this is stopword-grade — it would
        # emit O(n^2) junk pairs that carry no match signal (recall is
        # preserved by the other key families). The volume analogue of
        # the reference's top-1000 candidate truncation.
        max_key_docs: int = 256,
        minhash_seed: int = 42,
        use_token_keys: bool = True,
        use_lsh_keys: bool = True,
        use_media_keys: bool = True,
    ):
        assert lsh_hashes % lsh_bands == 0
        self.lsh_hashes = lsh_hashes
        self.lsh_bands = lsh_bands
        self.rows_per_band = lsh_hashes // lsh_bands
        self.hot_key_cap = hot_key_cap
        self.max_salts = max_salts
        self.max_key_docs = max_key_docs
        self.minhash_seed = minhash_seed
        self.use_token_keys = use_token_keys
        self.use_lsh_keys = use_lsh_keys
        self.use_media_keys = use_media_keys

    def fingerprint(self) -> dict:
        return dict(vars(self))


def _lsh_keys_udf(cfg: BlockConfig):
    @F.pandas_udf("array<string>")
    def lsh_keys(tokens: pd.Series) -> pd.Series:
        shingles = [char_shingles(list(t)) for t in tokens]
        sigs = minhash_fast_batch(
            shingles, n_hashes=cfg.lsh_hashes, seed=cfg.minhash_seed
        )
        return pd.Series(
            [
                [
                    "l:" + k
                    for k in band_keys_from_signature(
                        sig.tolist(), cfg.lsh_bands, cfg.rows_per_band
                    )
                ]
                for sig in sigs
            ]
        )

    return lsh_keys


def blocking_keys(
    doc_norm: DataFrame, cfg: BlockConfig, carry_sketch: bool = False
) -> DataFrame:
    """(doc_id, key[, q, monly]) — one row per document per blocking key.

    With ``carry_sketch`` the int8 embedding sketch + text-free-media
    flag ride along from doc_norm through the explode — no later join
    is needed to attach them for the fused pair prefilter.
    """
    # the MinHash UDF is per-row CPU; parquet read splits of a compact
    # doc_norm table under-parallelize it (observed: flat scaling from
    # 8 to 32 cores) — spread rows explicitly before the Python stage
    spark = doc_norm.sparkSession
    doc_norm = doc_norm.repartition(spark.sparkContext.defaultParallelism)
    extra = []
    if carry_sketch:
        doc_norm = doc_norm.withColumn(
            "monly", (F.size("media_refs") > 0) & (F.size("tokens") == 0)
        ).withColumnRenamed("emb_q", "q")
        extra = ["q", "monly"]
    parts = []
    if cfg.use_token_keys:
        from chameleon_entity_linking_spark.functions.tokenize import tokens_col

        name_tokens = F.array_distinct(tokens_col(F.col("name_text")))
        parts.append(
            doc_norm.select(
                "doc_id",
                F.explode(
                    F.transform(name_tokens, lambda t: F.concat(F.lit("t:"), t))
                ).alias("key"),
                *extra,
            )
        )
    if cfg.use_lsh_keys:
        parts.append(
            doc_norm.select(
                "doc_id",
                F.explode(_lsh_keys_udf(cfg)(F.col("tokens"))).alias("key"),
                *extra,
            )
        )
    if cfg.use_media_keys:
        parts.append(
            doc_norm.select(
                "doc_id",
                F.explode(
                    F.transform(
                        F.col("media_refs"), lambda m: F.concat(F.lit("m:"), m)
                    )
                ).alias("key"),
                *extra,
            )
        )
    keys = parts[0]
    for p in parts[1:]:
        keys = keys.unionByName(p)
    return keys.dropDuplicates(["doc_id", "key"])


def candidate_pairs(
    doc_norm: DataFrame, cfg: BlockConfig, score_cfg=None
) -> tuple[DataFrame, DataFrame]:
    """Generate canonical candidate pairs + per-key metrics.

    Returns (pairs(doc_a, doc_b), key_metrics(key, n_docs, class)).

    When ``score_cfg`` (a ScoreConfig with cascade + prefilter on) is
    given, the scoring stage's int8-sketch prefilter is FUSED into
    pair generation: each side of the self-join carries the 64-byte
    ``emb_q`` sketch, the estimated-cosine cut is applied in the join
    projection — *before* the pair-dedup shuffle — and only surviving
    pairs are deduplicated/materialized. Measured: ~73% of raw
    candidates die at the sketch, so fusing cuts the dedup shuffle and
    the pairs table by the same fraction. Works at any scale (the
    sketch travels with the rows; nothing is broadcast).
    """
    fuse_sketch = (
        score_cfg is not None
        and getattr(score_cfg, "cascade", False)
        and getattr(score_cfg, "prefilter_min_cheap", None) is not None
    )
    # keys are consumed by three downstream plans (counts/metrics,
    # normal self-join, salted triangle join) — persist so the MinHash
    # UDF pass runs once, not once per consumer.
    # String keys are hashed to 64-bit ints before any shuffle/join:
    # the self-join is a latency-bound hash probe, and 8-byte keys
    # keep it cache-resident where ~40-byte strings thrash (measured:
    # the join stage's CPU inflated ~3x at high parallelism). A 64-bit
    # collision (P ~ 1e-7 at millions of keys) just adds one junk
    # candidate pair, which scoring rejects.
    keys = (
        blocking_keys(doc_norm, cfg, carry_sketch=fuse_sketch)
        .withColumn("key", F.xxhash64("key"))
        .persist()
    )
    counts = keys.groupBy("key").agg(F.count("*").alias("n_docs")).persist()
    cap = cfg.hot_key_cap
    ceiling = min(cap * cfg.max_salts, cfg.max_key_docs)
    key_metrics = counts.withColumn(
        "class",
        F.when(F.col("n_docs") < 2, "singleton")
        .when(F.col("n_docs") <= cap, "normal")
        .when(F.col("n_docs") <= ceiling, "salted")
        .otherwise("dropped"),
    )
    # joining (key -> count) back: hash join on key; the subsequent
    # self-join shuffles on key too, so the exchange is reused
    keyed = keys.join(
        counts.where((F.col("n_docs") >= 2) & (F.col("n_docs") <= ceiling)),
        "key",
    )
    def _pair_keep(qa, qb, ma, mb):
        est_cos = F.aggregate(
            F.zip_with(qa, qb, lambda x, y: x.cast("int") * y.cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ) / F.lit(127.0 * 127.0)
        # scoring uses the same int8 dot -> this cut is bit-exact with
        # the prefilter the scoring stage re-applies
        return ma | mb | (est_cos >= F.lit(score_cfg.prefilter_min_cheap))

    side_cols = ["key", "doc_id"] + (["q", "monly"] if fuse_sketch else [])
    normal = keyed.where(F.col("n_docs") <= cap).select(*side_cols)
    a, b = normal.alias("a"), normal.alias("b")
    joined_normal = a.join(b, "key").where(
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    if fuse_sketch:
        joined_normal = joined_normal.where(
            _pair_keep(
                F.col("a.q"), F.col("b.q"), F.col("a.monly"), F.col("b.monly")
            )
        )
    pairs_normal = joined_normal.select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )

    hot = (
        keyed.where(F.col("n_docs") > cap)
        .withColumn("s", F.ceil(F.col("n_docs") / cap).cast("int"))
        .withColumn("g", F.pmod(F.xxhash64("doc_id", "key"), F.col("s")).cast("int"))
    )
    hot_left = hot.select(
        "key",
        F.col("g").alias("bi"),
        F.explode(F.sequence(F.col("g"), F.col("s") - 1)).alias("bj"),
        F.col("doc_id").alias("da"),
        *([F.col("q").alias("qa"), F.col("monly").alias("mta")] if fuse_sketch else []),
    )
    hot_right = hot.select(
        "key",
        F.explode(F.sequence(F.lit(0), F.col("g"))).alias("bi"),
        F.col("g").alias("bj"),
        F.col("doc_id").alias("db"),
        *([F.col("q").alias("qb"), F.col("monly").alias("mtb")] if fuse_sketch else []),
    )
    joined_hot = hot_left.join(hot_right, ["key", "bi", "bj"]).where(
        F.col("da") != F.col("db")
    )
    if fuse_sketch:
        joined_hot = joined_hot.where(
            _pair_keep(F.col("qa"), F.col("qb"), F.col("mta"), F.col("mtb"))
        )
    pairs_hot = joined_hot.select(
        F.least("da", "db").alias("doc_a"),
        F.greatest("da", "db").alias("doc_b"),
    )

    pairs = pairs_normal.unionByName(pairs_hot).dropDuplicates(
        ["doc_a", "doc_b"]
    )
    return pairs, key_metrics
