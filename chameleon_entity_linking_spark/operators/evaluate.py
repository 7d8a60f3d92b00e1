"""Evaluation stage: pairwise precision/recall/F1 vs labeled pairs.

The ir_measures analogue (`BiEncoder/test.py:134-137`): instead of
nDCG/P@10 over qrels, entity resolution is scored as pairwise
classification over the labeled pairs — a pair is predicted "match"
iff both docs landed in the same cluster. Labels are generated at the
fixed blocking keys (FIXTURES.md §2), satisfying the north rule's
"F1 >= 0.99 on labeled pairs at the same blocking key".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_confusion(labels: DataFrame, assignments: DataFrame) -> DataFrame:
    """labels(doc_a, doc_b, is_match) x assignments(doc_id, cluster_id)
    -> one row per label with predicted + actual."""
    ca = assignments.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("cluster_a")
    )
    cb = assignments.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cluster_b")
    )
    return (
        labels.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "is_match",
            (F.col("cluster_a") == F.col("cluster_b")).alias("predicted"),
        )
    )


def confusion_counts(labels: DataFrame, assignments: DataFrame) -> DataFrame:
    """One-row (tp, fp, fn, tn) DataFrame — THE confusion aggregation;
    pairwise_f1 and the driver-contract F1 gate (__spark_entry__'s
    er_pipeline_f1) both read it, so the pytest metric and the
    driver-visible gate can never diverge."""
    conf = pairwise_confusion(labels, assignments)
    return conf.agg(
        F.sum((F.col("is_match") & F.col("predicted")).cast("long")).alias("tp"),
        F.sum((~F.col("is_match") & F.col("predicted")).cast("long")).alias("fp"),
        F.sum((F.col("is_match") & ~F.col("predicted")).cast("long")).alias("fn"),
        F.sum((~F.col("is_match") & ~F.col("predicted")).cast("long")).alias("tn"),
    )


def pairwise_f1(labels: DataFrame, assignments: DataFrame) -> dict:
    """{tp, fp, fn, tn, precision, recall, f1} as plain floats."""
    row = confusion_counts(labels, assignments).collect()[0]
    tp, fp, fn, tn = (int(row[k] or 0) for k in ("tp", "fp", "fn", "tn"))
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
