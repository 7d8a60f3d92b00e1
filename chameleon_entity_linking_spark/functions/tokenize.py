"""Tokenization / normalization expressions.

The reference tokenizes with a HuggingFace tokenizer
(`BiEncoder/model.py:46-47`); in this engine tokenization is a
deterministic lowercase + alnum-run split so it is reproducible with
zero external models and expressible identically in Spark SQL and
DuckDB (for oracle checks).

The *hot path* is pure JVM (`F.lower` + `F.split` — whole-stage
codegen, no Python); the BPE-ish sub-word splitter used for text
analysis runs as an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Token = maximal run of [a-z0-9] after lowercasing. ASCII-only class,
# so Spark and DuckDB agree byte-for-byte on any input.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

# BPE-ish word-piece pattern: leading space groups, numbers, words,
# punctuation runs (GPT-2-style pre-tokenizer shape, simplified).
BPE_ISH_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]+")


def tokens_col(text: Column) -> Column:
    """array<string> of normalized tokens; empties removed (JVM-side)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def tokens_sql(expr: str) -> str:
    """The DuckDB-equivalent SQL for :func:`tokens_col` (oracle use)."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'),"
        f" t -> t <> '')"
    )


def bpe_ish_tokens(text: str) -> list[str]:
    """Sub-word-ish token split for token-count analytics (Python side)."""
    return BPE_ISH_RE.findall(text or "")


def char_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Distinct character k-shingles over the space-joined token text.

    The MinHash input unit: shingling the normalized text makes the
    signature robust to token-level typos (the analogue of the
    reference's dense-embedding recall, `BiEncoder/test_retrieval.py`).
    """
    s = " ".join(tokens)
    if len(s) < k:
        return [s] if s else []
    return sorted({s[i : i + k] for i in range(len(s) - k + 1)})
