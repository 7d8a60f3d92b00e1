"""Blocking stage: salted multi-key candidate-pair generation.

The analogue of the reference's candidate generation — BM25 run files
(`BiEncoder/test.py:63-79`) and FAISS top-k retrieval
(`BiEncoder/test_retrieval.py:51-76`). A global ANN index cannot
exist at 10^12 docs, so candidate generation becomes a
hash-partitioned pair expansion over three key families:

  t:<token>      tokens of the *name* span (entity-name terms — the
                 BM25-term analogue)
  l:<band>       MinHash-LSH band keys over char-3-shingles of the
                 full normalized text (the dense-recall analogue)
  m:<media_ref>  exact media content hashes (the exact entity-title
                 key analogue, `BiEncoder/model.py:404`)

Physical shape (grouped expansion, not a self-join): a cheap
map-side-combined count pass classifies keys; surviving keys are
grouped into one bounded member array per key (filter-before-collect:
nothing ever buffers more than the ceiling) and intra-key pairs are
expanded JVM-side with posexplode+slice, streaming out of the
generator. A self-join would re-shuffle the key table against itself
and probe 2x the rows; grouped expansion pays one wide exchange
(reused by the join and the groupBy — same key partitioning).
(Round-1 measurement: the self-join formulation showed ~zero speedup
from 1 to 4 executors; this is its replacement.)

Skew discipline (north rule: explicit partitioning + skew splitting):
  * keys with one member generate no pairs -> dropped before expansion
  * keys with <= ``hot_key_cap`` members expand directly from the
    grouped row (<= C(cap,2) pairs per row — bounded task work)
  * hotter keys are re-exploded and *salted*: members get a
    deterministic salt group g in [0, s), s = ceil(n/cap), and the
    classic triangle-join replication — a member is LEFT in
    bucket-pairs (g, j>=g) and RIGHT in (i<=g, g) — generates every
    intra-key pair exactly once across buckets, each bucket bounded
    ~cap members per side, so no single task owns a hot key's O(n^2)
  * keys hotter than ``min(cap * max_salts, max_key_docs)`` are
    dropped and counted in metrics (stopword-grade keys; the
    reference's analogous bound is its top-1000 candidate truncation)

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
        # diagnostics: keep the human-readable key strings through the
        # shuffle + in key_metrics (default hashes them to 64-bit ints
        # for shuffle compactness; a 64-bit collision, P ~ 1e-7 at
        # millions of keys, just adds one junk candidate pair that
        # scoring rejects)
        debug_keys: bool = False,
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
        self.debug_keys = debug_keys

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


def blocking_keys(doc_norm: DataFrame, cfg: BlockConfig) -> DataFrame:
    """(doc_id, key) — one row per document per blocking key.

    May emit a (doc_id, key) pair more than once (media_ref repeats,
    per-family overlaps); consumers dedup via ``collect_set`` in the
    grouped expansion, so no dedicated dedup shuffle is spent here.
    """
    if not (cfg.use_token_keys or cfg.use_lsh_keys or cfg.use_media_keys):
        raise ValueError(
            "BlockConfig: at least one key family must be enabled "
            "(use_token_keys / use_lsh_keys / use_media_keys)"
        )
    # the MinHash UDF is per-row CPU; parquet read splits of a compact
    # doc_norm table under-parallelize it (observed: flat scaling from
    # 8 to 32 cores) — spread rows explicitly before the Python stage
    spark = doc_norm.sparkSession
    doc_norm = doc_norm.repartition(spark.sparkContext.defaultParallelism)
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
            )
        )
    if cfg.use_lsh_keys:
        parts.append(
            doc_norm.select(
                "doc_id",
                F.explode(_lsh_keys_udf(cfg)(F.col("tokens"))).alias("key"),
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
            )
        )
    keys = parts[0]
    for p in parts[1:]:
        keys = keys.unionByName(p)
    return keys


def candidate_pairs(
    doc_norm: DataFrame, cfg: BlockConfig, persisted_out: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """Generate canonical candidate pairs + per-key metrics.

    Returns (pairs(doc_a, doc_b), key_metrics(key, n_docs, class)).

    The key table is ``persist()``-ed (two passes consume it). Pass
    ``persisted_out`` (a list) to receive the cached DataFrame for
    ``unpersist()`` once both outputs are materialized (long-lived
    sessions would otherwise accumulate cached blocks).
    """
    # (doc_id, key) is unique by construction: token/media keys are
    # array_distinct per doc, LSH band keys carry their band index,
    # and the t:/l:/m: prefixes keep families disjoint — so no dedup
    # shuffle is spent on the key table, and count(*) == member count.
    keys = blocking_keys(doc_norm, cfg)
    if not cfg.debug_keys:
        keys = keys.withColumn("key", F.xxhash64("key"))
    # two consumers (counts pass + grouping pass) — persist so the
    # MinHash UDF runs once, not once per consumer
    keys = keys.persist()
    if persisted_out is not None:
        persisted_out.append(keys)
    cap = cfg.hot_key_cap
    ceiling = min(cap * cfg.max_salts, cfg.max_key_docs)
    # pass 1: per-key member counts. Fully map-side combinable — the
    # shuffled bytes are one (key, partial_count) per distinct key per
    # map partition, not the key table itself.
    counts = keys.groupBy("key").agg(F.count("*").alias("n_docs"))
    key_metrics = counts.select(
        "key",
        "n_docs",
        F.when(F.col("n_docs") < 2, "singleton")
        .when(F.col("n_docs") <= cap, "normal")
        .when(F.col("n_docs") <= ceiling, "salted")
        .otherwise("dropped")
        .alias("class"),
    )
    # pass 2: filter BEFORE collecting, so no aggregation buffer ever
    # holds more than `ceiling` members — a stopword-grade key (10^8+
    # members at 10^12 docs) is dropped without ever materializing its
    # member list anywhere. The join and the groupBy hash-partition on
    # the same key, so Catalyst reuses one exchange for both.
    grouped = (
        keys.join(
            counts.where((F.col("n_docs") >= 2) & (F.col("n_docs") <= ceiling)),
            "key",
        )
        .groupBy("key")
        .agg(F.collect_list("doc_id").alias("docs"))
        .withColumn("n_docs", F.size("docs"))
    )

    # -- normal keys: bounded JVM-side pair expansion, no self-join -------
    small = grouped.where(F.col("n_docs") <= cap)
    exploded = small.select(
        "docs", F.posexplode("docs").alias("i", "da")
    )
    pairs_normal = exploded.select(
        "da",
        F.explode(
            F.slice(
                "docs", F.col("i") + F.lit(2), F.size("docs") - F.col("i") - 1
            )
        ).alias("db"),
    ).select(
        F.least("da", "db").alias("doc_a"),
        F.greatest("da", "db").alias("doc_b"),
    )

    # -- hot keys: salted triangle join (skew splitting) ------------------
    hot = (
        grouped.where(F.col("n_docs") > cap)  # grouped is <= ceiling already
        .select("key", "n_docs", F.explode("docs").alias("doc_id"))
        .withColumn("s", F.ceil(F.col("n_docs") / cap).cast("int"))
        .withColumn("g", F.pmod(F.xxhash64("doc_id", "key"), F.col("s")).cast("int"))
    )
    hot_left = hot.select(
        "key",
        F.col("g").alias("bi"),
        F.explode(F.sequence(F.col("g"), F.col("s") - 1)).alias("bj"),
        F.col("doc_id").alias("da"),
    )
    hot_right = hot.select(
        "key",
        F.explode(F.sequence(F.lit(0), F.col("g"))).alias("bi"),
        F.col("g").alias("bj"),
        F.col("doc_id").alias("db"),
    )
    pairs_hot = (
        hot_left.join(hot_right, ["key", "bi", "bj"])
        .where(F.col("da") != F.col("db"))
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
        )
    )

    pairs = pairs_normal.unionByName(pairs_hot).dropDuplicates(
        ["doc_a", "doc_b"]
    )
    return pairs, key_metrics
