"""Deterministic hashing-trick text encoder (bi-encoder stand-in).

The reference encodes passages with a GPU sentence-transformer in
length-sorted batches (`BiEncoder/model.py:68-166`; note its
indentation bug — only the last batch is encoded — which we of course
do not replicate). Torch is unavailable in this sandbox, so the
engine ships a deterministic stand-in with the *same operator shape*:
batched, partition-parallel inference over Arrow record batches,
model "weights" broadcast once per executor, L2-normalized float32
output. Swapping in a real model changes only the encode function.

Features: token unigrams + char trigrams of the joined token text,
signed feature hashing into ``dim`` buckets (hash bit 63 -> sign),
then L2 normalization — a sparse random projection, so cosine on
these vectors approximates Jaccard-weighted lexical overlap (good
enough to separate typo-perturbed mentions of the same entity from
distinct entities).

Hot path (``encode_hashed_batch``): fully vectorized, md5-free.
Token base hashes arrive PRE-HASHED from the JVM (``xxhash64`` per
token, computed once in whole-stage codegen as ``tokens_h``);
trigrams pack losslessly into uint64 (3 codepoints x 21 bits, same
construction as minhash._pack_shingles); both families go through
one splitmix64 finalize and ONE ``np.bincount`` per Arrow batch —
no per-feature Python loop anywhere. (Round-2 profile: the previous
per-feature ``hashlib.md5`` loop made normalize the second-largest
single-executor stage; this is its replacement.)
"""

from __future__ import annotations

import numpy as np

from chameleon_entity_linking_spark.functions.minhash import (
    _splitmix64,
    pack_char3_windows,
    shingle_base_hash,
)

DEFAULT_DIM = 64

_U64 = np.uint64
# family-separation salts: token-unigram and char-trigram features of
# the same underlying bytes must not collide into the same bucket/sign
_TOKEN_SALT = _U64(0xA0761D6478BD642F)
_TRIGRAM_SALT = _U64(0xE7037ED1A0B428DB)


# the embedding trigram space is the MULTISET view of the shared
# char-3 packing (repeated trigrams keep their weight, unlike the
# minhash shingle SET) — one packing definition for both spaces
_pack_trigram_windows = pack_char3_windows


def encode_hashed_batch(
    token_hash_lists: list, texts: list[str], dim: int = DEFAULT_DIM
) -> np.ndarray:
    """(n_docs, dim) float32, rows L2-normalized (zeros stay zero).

    ``token_hash_lists[i]``: the doc's per-token 64-bit hashes (any
    int64 container — the JVM's ``xxhash64(token)`` column);
    ``texts[i]``: the joined token text (trigram source). The whole
    batch reduces through one flattened ``bincount`` — per-row work
    is two C-level array ops, never a per-feature Python loop.
    """
    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float64)
    feats: list[np.ndarray] = []
    rows: list[np.ndarray] = []
    with np.errstate(over="ignore"):
        for i in range(n):
            th = np.asarray(token_hash_lists[i], dtype=np.int64).view(_U64)
            tri = _pack_trigram_windows(texts[i])
            if not len(th) and not len(tri):
                continue
            h = np.concatenate(
                [
                    _splitmix64(th ^ _TOKEN_SALT),
                    _splitmix64(tri ^ _TRIGRAM_SALT),
                ]
            )
            feats.append(h)
            rows.append(np.full(len(h), i, dtype=np.int64))
    if feats:
        h = np.concatenate(feats)
        r = np.concatenate(rows)
        idx = (h % _U64(dim)).astype(np.int64)
        sign = np.where((h >> _U64(63)).astype(bool), -1.0, 1.0)
        out = np.bincount(
            r * dim + idx, weights=sign, minlength=n * dim
        ).reshape(n, dim)
    out = out.astype(np.float32)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


# byte-identical to the minhash family's base hash — one construction
_feature_hash = shingle_base_hash


def encode_batch(token_lists: list[list[str]], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Standalone-string entry point (tests / ad-hoc use): hashes
    tokens driver-side (md5 base hash) then reuses the vectorized
    core. The pipeline path is ``encode_hashed_batch`` — the JVM
    supplies the token hashes, so no string ever re-hashes in Python."""
    hashes = [
        np.fromiter(
            (_feature_hash(t) for t in toks), dtype=_U64, count=len(toks)
        ).view(np.int64)
        for toks in token_lists
    ]
    texts = [" ".join(toks) for toks in token_lists]
    return encode_hashed_batch(hashes, texts, dim)


def cosine_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two (n, d) matrices; zero vectors -> 0.0."""
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return np.where(den == 0, 0.0, num / np.where(den == 0, 1.0, den))
