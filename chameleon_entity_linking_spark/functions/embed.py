"""Deterministic hashing-trick text encoder (bi-encoder stand-in).

The reference encodes passages with a GPU sentence-transformer in
length-sorted batches (`BiEncoder/model.py:68-166`; note its
indentation bug — only the last batch is encoded — which we of course
do not replicate). Torch is unavailable in this sandbox, so the
engine ships a deterministic stand-in with the *same operator shape*:
batched, partition-parallel inference over Arrow record batches,
model "weights" broadcast once per executor, L2-normalized float32
output. Swapping in a real model changes only `encode_batch`.

Features: token unigrams + char trigrams, signed feature hashing into
``dim`` buckets (hash bit 63 -> sign), then L2 normalization — a
sparse random projection, so cosine on these vectors approximates
Jaccard-weighted lexical overlap (good enough to separate
typo-perturbed mentions of the same entity from distinct entities).
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_DIM = 64


def _feature_hash(feature: str) -> int:
    return int.from_bytes(hashlib.md5(feature.encode()).digest()[:8], "big")


def encode_batch(token_lists: list[list[str]], dim: int = DEFAULT_DIM) -> np.ndarray:
    """(n_docs, dim) float32, rows L2-normalized (zeros stay zero)."""
    out = np.zeros((len(token_lists), dim), dtype=np.float32)
    for row, tokens in enumerate(token_lists):
        if not tokens:
            continue
        feats: list[str] = list(tokens)
        joined = " ".join(tokens)
        feats.extend(joined[i : i + 3] for i in range(max(len(joined) - 2, 0)))
        h = np.fromiter(
            (_feature_hash(f) for f in feats), dtype=np.uint64, count=len(feats)
        )
        idx = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)).astype(bool), -1.0, 1.0).astype(
            np.float32
        )
        np.add.at(out[row], idx, sign)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def cosine_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two (n, d) matrices; zero vectors -> 0.0."""
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return np.where(den == 0, 0.0, num / np.where(den == 0, 1.0, den))
