"""Deterministic synthetic corpus: interleaved text+media documents
with ground-truth entity clusters.

This is the engine's fixture generator (FIXTURES.md §1-3) — the
analogue of the reference's MS MARCO corpus + qrels
(`BiEncoder/test.py:63-79`): a labeled corpus on which blocking +
scoring + clustering can be verified to pairwise F1 >= 0.99.

Scale-conscious by construction: documents are a pure function of
(family_id, seed), generated partition-parallel with ``mapInPandas``
over ``spark.range(n_families)`` — no document ever materializes on
the driver. One honest bound: the shared VOCABULARY (``_vocab``) IS
driver-built — a Python loop linear in ``vocab_size`` (which tracks
``n_entities // 2``), measured ~8 s per 500k words and shipped into
each mapInPandas closure — so the generator as-written is practical
to ~10^7 entities (~10^7-10^8 docs). Past that, vocabulary words
would need to be derived on demand per family from the rng (changing
every generated corpus, so deliberately NOT done mid-project: the
pinned oracles dispatch on corpus checksums).

Structure:
- Entities come in *families* of ``family_size``; all entities of a
  family share two "name base" tokens -> in-family cross-entity doc
  pairs collide on blocking keys = hard negatives (the analogue of
  `msmarco-hard-negatives.jsonl.gz`, `BiEncoder/train.py:91-125`).
- Each entity emits 1..6 mention documents: canonical span sequence
  (2-8 spans: text spans of 3-12 vocab tokens, 0-2 media spans whose
  ``media_ref`` stays EXACT across mentions — the exact-match key
  analogue of the reference's entity `title`), perturbed per mention
  by char typos, token drops and swaps.
- ``hot_fraction`` of documents get a shared hot token ("thecorpN");
  the number of hot tokens scales so each hot blocking key holds
  ~150 docs — inside the salted range (exercises skew salting at
  every scale rather than being dropped as stopword-grade).
- ``offset`` is the span's position; (kind, text, media_ref, order)
  is the per-row invariant every stage must preserve (input_hint).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
LABEL_SCHEMA = "doc_a string, doc_b string, is_match boolean"
CLUSTER_SCHEMA = "doc_id string, cluster_id string"

_VOCAB_SIZE = 4000
_CONSONANT = "bcdfghjklmnpqrstvwz"
_VOWEL = "aeiou"


def _vocab(seed: int, size: int = _VOCAB_SIZE) -> list[str]:
    """Pronounceable pseudo-words; fixed for a given (seed, size)."""
    rng = np.random.RandomState(seed ^ 0x5EED)
    words = []
    for _ in range(size):
        n = rng.randint(2, 5)
        w = "".join(
            _CONSONANT[rng.randint(len(_CONSONANT))] + _VOWEL[rng.randint(len(_VOWEL))]
            for _ in range(n)
        )
        words.append(w)
    return sorted(set(words))


def _typo(word: str, rng: np.random.RandomState) -> str:
    """One character edit: substitute / delete / insert / transpose."""
    if not word:
        return word
    op = rng.randint(4)
    i = rng.randint(len(word))
    c = "abcdefghijklmnopqrstuvwxyz"[rng.randint(26)]
    if op == 0:
        return word[:i] + c + word[i + 1 :]
    if op == 1 and len(word) > 1:
        return word[:i] + word[i + 1 :]
    if op == 2:
        return word[:i] + c + word[i:]
    if i + 1 < len(word):
        return word[:i] + word[i + 1] + word[i] + word[i + 2 :]
    return word


class SynthConfig:
    def __init__(
        self,
        n_entities: int = 60,
        seed: int = 42,
        family_size: int = 4,
        hot_fraction: float = 0.02,
        typo_rate: float = 0.08,
        drop_rate: float = 0.05,
        max_mentions: int = 6,
        neg_pairs_per_family: int = 6,
    ):
        self.n_entities = n_entities
        self.seed = seed
        self.family_size = family_size
        self.hot_fraction = hot_fraction
        self.typo_rate = typo_rate
        self.drop_rate = drop_rate
        self.max_mentions = max_mentions
        self.neg_pairs_per_family = neg_pairs_per_family

    @property
    def n_families(self) -> int:
        return (self.n_entities + self.family_size - 1) // self.family_size

    @property
    def n_hot_keys(self) -> int:
        """Enough hot tokens that each hot key holds ~150 docs
        (above hot_key_cap=64 -> salted, below max_key_docs=256)."""
        approx_docs = self.n_entities * 3.5
        return max(1, int(approx_docs * self.hot_fraction / 150))

    @property
    def vocab_size(self) -> int:
        """Vocabulary grows with corpus size (a fixed tiny vocabulary
        makes every token stopword-grade at scale — unrealistic and it
        degenerates token blocking). ~1 word per 2 entities above the
        4k floor."""
        return max(_VOCAB_SIZE, self.n_entities // 2)


def _family_rng(cfg: SynthConfig, family_id: int, salt: str) -> np.random.RandomState:
    digest = hashlib.md5(f"{cfg.seed}:{salt}:{family_id}".encode()).digest()
    return np.random.RandomState(int.from_bytes(digest[:4], "big"))


def _gen_family(cfg: SynthConfig, vocab: list[str], family_id: int):
    """All docs + labels + expected clusters for one family.

    Returns (docs, labels, clusters) where docs is a list of
    (doc_id, spans) and spans is a list of (kind, text, media_ref,
    offset) tuples.
    """
    rng = _family_rng(cfg, family_id, "gen")
    nv = len(vocab)
    base = [vocab[rng.randint(nv)], vocab[rng.randint(nv)]]
    docs, labels, clusters = [], [], []
    ent_docs: list[list[str]] = []
    lo = family_id * cfg.family_size
    hi = min(lo + cfg.family_size, cfg.n_entities)
    for eid in range(lo, hi):
        # canonical entity: name span + body spans + media spans
        name_tokens = base + [vocab[rng.randint(nv)], vocab[rng.randint(nv)], str(1000 + eid)]
        n_body = rng.randint(1, 6)
        body = [
            [vocab[rng.randint(nv)] for _ in range(rng.randint(3, 13))]
            for _ in range(n_body)
        ]
        n_media = rng.randint(0, 3)
        media_refs = [
            "m" + hashlib.md5(f"{cfg.seed}:{eid}:{m}".encode()).hexdigest()[:16]
            for m in range(n_media)
        ]
        n_mentions = 1 + int(rng.randint(cfg.max_mentions))
        ids = []
        for j in range(n_mentions):
            doc_id = f"d{eid:08d}_{j}"
            ids.append(doc_id)
            spans = []
            # mention 0 is the canonical form; others are perturbed
            for tokens in [name_tokens] + body:
                toks = list(tokens)
                if j > 0:
                    kept = [
                        t for t in toks if rng.random_sample() > cfg.drop_rate
                    ] or toks[:1]
                    toks = [
                        _typo(t, rng) if rng.random_sample() < cfg.typo_rate else t
                        for t in kept
                    ]
                    if len(toks) > 2 and rng.random_sample() < 0.2:
                        i = rng.randint(len(toks) - 1)
                        toks[i], toks[i + 1] = toks[i + 1], toks[i]
                spans.append(("text", " ".join(toks), ""))
            refs = list(media_refs)
            if j > 0 and len(refs) > 1 and rng.random_sample() < 0.5:
                rng.shuffle(refs)  # media spans may reorder; refs stay exact
            for ref in refs:
                kind = "image" if ref[-1] not in "012" else "video"
                spans.append((kind, "", ref))
            if rng.random_sample() < cfg.hot_fraction:
                # hot token goes INTO the name span (token blocking
                # keys come from there) as a suffix, so the hot key
                # actually reaches the salted-join path; suffix
                # position keeps the Jaro-Winkler prefix intact
                hot = rng.randint(cfg.n_hot_keys)
                kind0, text0, media0 = spans[0]
                spans[0] = (kind0, f"{text0} thecorp{hot}", media0)
            docs.append(
                (doc_id, [(k, t, m, off) for off, (k, t, m) in enumerate(spans)])
            )
        ent_docs.append(ids)
        cluster_id = min(ids)
        clusters.extend((d, cluster_id) for d in ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = sorted((ids[x], ids[y]))
                labels.append((a, b, True))
    # hard negatives: cross-entity, same family (shared base tokens).
    # Draws are independent and CAN repeat a pair (few entity pairs
    # per family) — dedup before emitting: a duplicate label row would
    # double-count its pair in the pairwise-F1 confusion counts
    # (evaluate.pairwise_confusion joins labels without dedup). The
    # rng draw sequence is unchanged, so docs/clusters and the
    # kept-pair set stay deterministic.
    neg_rng = _family_rng(cfg, family_id, "neg")
    if len(ent_docs) > 1:
        seen_negs = set()
        for _ in range(cfg.neg_pairs_per_family):
            ei, ej = neg_rng.choice(len(ent_docs), size=2, replace=False)
            da = ent_docs[ei][neg_rng.randint(len(ent_docs[ei]))]
            db = ent_docs[ej][neg_rng.randint(len(ent_docs[ej]))]
            a, b = sorted((da, db))
            if (a, b) not in seen_negs:
                seen_negs.add((a, b))
                labels.append((a, b, False))
    return docs, labels, clusters


def _part_iterator(cfg: SynthConfig, which: str):
    vocab = _vocab(cfg.seed, cfg.vocab_size)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for family_id in pdf["id"].tolist():
                docs, labels, clusters = _gen_family(cfg, vocab, int(family_id))
                if which == "docs":
                    rows.extend(
                        {
                            "doc_id": doc_id,
                            "spans": [
                                {
                                    "kind": k,
                                    "text": t,
                                    "media_ref": m,
                                    "offset": off,
                                }
                                for (k, t, m, off) in spans
                            ],
                        }
                        for doc_id, spans in docs
                    )
                elif which == "labels":
                    rows.extend(
                        {"doc_a": a, "doc_b": b, "is_match": y}
                        for a, b, y in labels
                    )
                else:
                    rows.extend(
                        {"doc_id": d, "cluster_id": c} for d, c in clusters
                    )
            yield pd.DataFrame(
                rows,
                columns={
                    "docs": ["doc_id", "spans"],
                    "labels": ["doc_a", "doc_b", "is_match"],
                    "clusters": ["doc_id", "cluster_id"],
                }[which],
            )

    return gen


def synth_tables(
    spark: SparkSession, cfg: SynthConfig, parallelism: int | None = None
) -> dict[str, DataFrame]:
    """Generate {documents, labels, expected_clusters} DataFrames.

    Each table is derived by an independent (deterministic) pass over
    the family-id range, so nothing is collected on the driver.
    """
    n_part = parallelism or max(
        2, min(spark.sparkContext.defaultParallelism, cfg.n_families)
    )
    base = spark.range(cfg.n_families).repartition(n_part)
    schema = {
        "docs": DOC_SCHEMA,
        "labels": LABEL_SCHEMA,
        "clusters": CLUSTER_SCHEMA,
    }
    out = {
        name: base.mapInPandas(_part_iterator(cfg, name), schema=schema[name])
        for name in ("docs", "labels", "clusters")
    }
    return {
        "documents": out["docs"],
        "labels": out["labels"],
        "expected_clusters": out["clusters"],
    }
