"""Text-analysis kernels: language ID, quality scoring, fingerprints.

Training-data-pipeline utilities over a document corpus (first-class
operators alongside the ER pipeline). All deterministic, all designed
to run inside Arrow-batched pandas UDFs or as pure Spark SQL
expressions (the SQL-expressible operator variants live in
``plans/driver_queries.py`` — q_lang_id, q_quality_score, q_simhash,
q_fingerprint; kernels here back the UDF variants and tests).
"""

from __future__ import annotations

import hashlib

# Tiny stopword inventories for an n-gram/stopword-ratio language
# heuristic. Deliberately small + frozen: the point is deterministic,
# cheap language ID, not linguistic accuracy.
LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in is that it was for on are with as his they at be this".split()
    ),
    "de": frozenset(
        "der die das und ist nicht ein eine mit von zu im den des sich auf".split()
    ),
    "fr": frozenset(
        "le la les et des est une dans que pour pas sur avec ne son ce il".split()
    ),
    "es": frozenset(
        "el la los las y es una en que por no con para su se del al como".split()
    ),
}


def lang_scores(tokens: list[str]) -> dict[str, float]:
    if not tokens:
        return {k: 0.0 for k in LANG_MARKERS}
    n = len(tokens)
    return {
        lang: sum(1 for t in tokens if t in marks) / n
        for lang, marks in LANG_MARKERS.items()
    }


def detect_lang(tokens: list[str], min_ratio: float = 0.05) -> str:
    # ties break toward the alphabetically-FIRST language — the same
    # tie-break q_lang_id and its DuckDB oracle use, so the Python
    # kernel and the SQL operator agree on tied inputs
    scores = lang_scores(tokens)
    lang, best = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return lang if best >= min_ratio else "und"


def rolling_fingerprint(text: str, window: int = 8, keep: int = 4) -> str:
    """Winnowing-style document fingerprint: k smallest window hashes
    of the byte stream, hex-joined. Stable under small local edits."""
    data = (text or "").encode()
    if len(data) <= window:
        return hashlib.md5(data).hexdigest()[:16]
    hashes = sorted(
        hashlib.md5(data[i : i + window]).hexdigest()[:8]
        for i in range(len(data) - window + 1)
    )[:keep]
    return "-".join(hashes)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token md5 hashes (unweighted)."""
    if not tokens:
        return 0
    counts = [0] * 64
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for bit in range(64):
            counts[bit] += 1 if (h >> bit) & 1 else -1
    v = 0
    for bit in range(64):
        if counts[bit] > 0:
            v |= 1 << bit
    # return as signed 64-bit so Spark LongType can hold it
    return v - (1 << 64) if v >= (1 << 63) else v
