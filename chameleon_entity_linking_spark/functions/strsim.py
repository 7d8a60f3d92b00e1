"""Vectorized string-similarity kernels (numpy, no external libs).

These are the engine's analogue of the reference's pairwise rerank
scorers (cross-encoder predict, `CrossEncoder/test.py:98-100`; cosine
mix, `BiEncoder/test.py:115-120`): batched, never per-row-interpreted.
They run inside Arrow-batched pandas UDFs — one call scores a whole
Arrow batch of pairs.

Levenshtein uses a two-row DP where each row update is fully
vectorized; the insert-cost prefix recurrence
``new[j] = min(t[j], new[j-1]+1)`` is solved in closed form with
``np.minimum.accumulate(t - arange) + arange`` (a standard
reformulation: new[j] = min_{k<=j} t[k] + (j-k)).

Jaro-Winkler follows the standard definition (match window
``max(|a|,|b|)//2 - 1``, transpositions halved, Winkler prefix boost
l<=4, p=0.1, applied when jaro > 0.7) — matching DuckDB's
``jaro_winkler_similarity`` so oracle checks can be exact.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def levenshtein(a: str, b: str) -> int:
    """Exact edit distance between two unicode strings."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    ca, cb = _codes(a), _codes(b)
    if len(ca) > len(cb):  # iterate over the shorter string
        ca, cb = cb, ca
    n = len(cb)
    arange = np.arange(1, n + 1, dtype=np.int64)
    prev = np.arange(n + 1, dtype=np.int64)
    for i, ch in enumerate(ca):
        # substitution / deletion costs from the previous row
        t = np.minimum(prev[:-1] + (cb != ch), prev[1:] + 1)
        # insertion recurrence via prefix-min closed form
        head = i + 1
        t = np.minimum(t, head + arange)  # cost of all-inserts from row head
        m = np.minimum.accumulate(t - arange) + arange
        prev = np.concatenate(([head], m))
    return int(prev[-1])


def jaro(a: str, b: str) -> float:
    """Jaro similarity.

    Matches DuckDB's ``jaro_similarity`` (a rapidfuzz port) exactly so
    oracle comparisons are bit-identical: transposition count is halved
    with *integer* division, and an empty side scores 0.0 (even when
    both are empty).
    """
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    ca, cb = _codes(a), _codes(b)
    window = max(max(la, lb) // 2 - 1, 0)
    b_matched = np.zeros(lb, dtype=bool)
    a_chars = []  # a's matched chars, in a-order
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        seg = (cb[lo:hi] == ca[i]) & ~b_matched[lo:hi]
        if seg.any():
            b_matched[lo + int(np.argmax(seg))] = True
            a_chars.append(ca[i])
    m = len(a_chars)
    if m == 0:
        return 0.0
    b_chars = cb[np.flatnonzero(b_matched)]  # b's matched chars, in b-order
    t = int(np.count_nonzero(np.asarray(a_chars, dtype=np.uint32) != b_chars)) // 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity with standard prefix boost."""
    j = jaro(a, b)
    if j <= boost_threshold:
        return j
    prefix = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def levenshtein_batch(a: Sequence[str], b: Sequence[str]) -> np.ndarray:
    """Edit distance for each aligned pair; vectorized inner loops."""
    return np.fromiter(
        (levenshtein(x or "", y or "") for x, y in zip(a, b)),
        dtype=np.int64,
        count=len(a),
    )


def levenshtein_ratio_batch(a: Sequence[str], b: Sequence[str]) -> np.ndarray:
    """1 - dist/max(len) similarity in [0,1]; 1.0 for two empties."""
    d = levenshtein_batch(a, b).astype(np.float64)
    mx = np.fromiter(
        (max(len(x or ""), len(y or "")) or 1 for x, y in zip(a, b)),
        dtype=np.float64,
        count=len(a),
    )
    return 1.0 - d / mx


def jaro_winkler_batch(a: Sequence[str], b: Sequence[str]) -> np.ndarray:
    return np.fromiter(
        (jaro_winkler(x or "", y or "") for x, y in zip(a, b)),
        dtype=np.float64,
        count=len(a),
    )
