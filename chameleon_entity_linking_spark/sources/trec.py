"""TREC run-format debug sink (K1 parity utility).

The reference emits ``qid Q0 pid rank score tag`` lines
(`BiEncoder/test.py:128-132` et al.). The engine's native outputs are
catalog tables; this util renders a ranked DataFrame into the same
line format for eyeball-parity against reference runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_trec(
    ranked: DataFrame,
    qid: str = "qid",
    pid: str = "pid",
    rank: str = "rank",
    score: str = "score",
    tag: str = "cel_spark",
) -> DataFrame:
    """DataFrame of (qid, pid, rank, score) -> single `line` column in
    TREC run format, ordered (qid, rank). Write with .text()."""
    return (
        ranked.select(
            F.format_string(
                "%s Q0 %s %d %s %s",
                F.col(qid).cast("string"),
                F.col(pid).cast("string"),
                F.col(rank).cast("int"),
                F.col(score).cast("string"),
                F.lit(tag),
            ).alias("line"),
            F.col(qid).alias("_q"),
            F.col(rank).alias("_r"),
        )
        .orderBy("_q", "_r")
        .select("line")
    )
