"""Readers for the reference's on-disk input formats (SURVEY.md §2.1).

Round 1 covered these sources "by analogue" (parquet tables of the
same shape); these are the real entry points, so a user can point the
engine at reference-shaped data:

  read_tsv_corpus        S1 — `pid \\t text` corpus TSV
                         (`BiEncoder/train.py:49-55`)
  read_tsv_queries       S2 — `qid \\t text` queries TSV
                         (`BiEncoder/train.py:58-64`)
  read_entity_annotations S3 — `id \\t [annotation, ...]` TSV whose
                         col2 is parsed with ``from_json`` — NEVER
                         ``eval`` (the reference evals it,
                         `BiEncoder/train.py:66-82` at :73,:82; the
                         survey forbids replicating that). The
                         reference's Python-literal single-quote files
                         parse as plain DATA via ``from_json``'s
                         ``allowSingleQuotes`` default — nothing is
                         ever executed; genuinely malformed payloads
                         yield NULL (dead-letterable).
  read_trec_run          S4 — 6-col whitespace-delimited run lines
                         `qid Q0 pid rank score tag`
                         (`BiEncoder/test.py:63-79`,
                         `utils/merge_results.py:6-20`). Scores are
                         typed DOUBLE here — the reference sorts them
                         as *strings* (`utils/merge_results.py:10,:24`,
                         the W2 bug we must not replicate).
  read_jsonl_negatives   S6 — (gzip) JSONL hard negatives
                         `{qid, pos:[pid], neg:{system:[pid]}}`
                         (`BiEncoder/train.py:91-125`)
  read_pickle_scores     S5 — gzip-pickle `{(qid,pid): score}` CE
                         teacher scores (`BiEncoder/train.py:84-89`).
                         A pickle is inherently a single-file,
                         driver-side artifact; this shim loads it once
                         and distributes it as a DataFrame. The
                         engine's native interchange for this table is
                         parquet `(qid, pid, score)`.

All readers return typed DataFrames with explicit schemas — no schema
inference anywhere (the data model contract, SURVEY.md §1).
Compressed inputs (.gz) are handled transparently by Spark's text/csv/
json sources, matching the reference's gzip usage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANNOTATION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("spot", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("rho", T.DoubleType()),
            T.StructField("id", T.LongType()),
        ]
    )
)

NEGATIVES_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("pos", T.ArrayType(T.LongType())),
        T.StructField("neg", T.MapType(T.StringType(), T.ArrayType(T.LongType()))),
    ]
)


def _read_tsv_keyed(
    spark: SparkSession, path: str, key_name: str
) -> DataFrame:
    # raw TSV semantics (the reference's line.split('\t')): quoting
    # and escaping DISABLED — CSV defaults would treat a leading
    # double quote as a quoted field (swallowing tabs inside it) and
    # backslashes as escapes, silently mangling any passage containing
    # those characters
    df = (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .option("escape", "")
        .schema(f"{key_name} LONG, text STRING")
        .csv(path)
    )
    # the reference strips every ingested string (`BiEncoder/model.py:32`)
    return df.select(key_name, F.trim(F.coalesce("text", F.lit(""))).alias("text"))


def read_tsv_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S1: (pid LONG, text STRING) from a 2-col TSV."""
    return _read_tsv_keyed(spark, path, "pid")


def read_tsv_queries(spark: SparkSession, path: str) -> DataFrame:
    """S2: (qid LONG, text STRING) from a 2-col TSV."""
    return _read_tsv_keyed(spark, path, "qid")


def read_entity_annotations(spark: SparkSession, path: str) -> DataFrame:
    """S3: (id LONG, annotations ARRAY<STRUCT<spot,title,start,end,rho,id>>).

    col2 is parsed with ``from_json`` against an explicit schema —
    never ``eval`` (untrusted text). ``from_json``'s default
    ``allowSingleQuotes`` accepts the reference's python-literal
    single-quoted files as plain DATA (unknown keys ignored, nothing
    executed). Genuinely malformed payloads yield NULL annotations
    (callers can route them to the dead-letter table, SURVEY.md K3);
    optional fields stay nullable so the ``coalesce(title, spot)``
    projection (P3/F10) works as in the reference
    (`BiEncoder/model.py:404`).
    """
    raw = (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .option("escape", "")
        .schema("id LONG, raw STRING")
        .csv(path)
    )
    return raw.select(
        "id", F.from_json("raw", ANNOTATION_SCHEMA).alias("annotations")
    )


def read_trec_run(spark: SparkSession, path: str) -> DataFrame:
    """S4: (qid LONG, pid LONG, rank INT, score DOUBLE, tag STRING).

    Parses `qid Q0 pid rank score tag` lines. Real run files are
    variously single-space, multi-space or tab delimited (trec_eval
    accepts any whitespace), so lines are read as text and split on
    ``\\s+`` rather than a hard-coded separator. ``score`` is cast to
    DOUBLE at the boundary so every downstream sort is numeric — the
    reference keeps it a string and lexicographically mis-sorts merged
    runs (`utils/merge_results.py:10,:24`); that bug is deliberately
    not replicated (SURVEY.md W2).
    """
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        spark.read.text(path)
        .where(F.trim("value") != "")
        .select(
            F.get(parts, 0).cast("long").alias("qid"),
            F.get(parts, 2).cast("long").alias("pid"),
            F.get(parts, 3).cast("int").alias("rank"),
            F.get(parts, 4).cast("double").alias("score"),
            F.get(parts, 5).alias("tag"),
        )
    )


def read_jsonl_negatives(spark: SparkSession, path: str) -> DataFrame:
    """S6: schema'd JSONL (optionally .gz) hard negatives —
    (qid LONG, pos ARRAY<LONG>, neg MAP<STRING, ARRAY<LONG>>)."""
    return spark.read.schema(NEGATIVES_SCHEMA).json(path)


def negatives_capped(
    negs: DataFrame, per_system: int = 4
) -> DataFrame:
    """P6: explode the neg map and keep <= ``per_system`` negatives per
    (qid, system), set-deduped — the distributed form of
    `BiEncoder/train.py:110-122`."""
    from pyspark.sql import Window

    exploded = (
        negs.select("qid", F.explode("neg").alias("system", "pids"))
        .select("qid", "system", F.explode("pids").alias("pid"))
        .dropDuplicates(["qid", "system", "pid"])
    )
    w = Window.partitionBy("qid", "system").orderBy("pid")
    return (
        exploded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_system)
        .drop("rn")
    )


def read_pickle_scores(spark: SparkSession, path: str) -> DataFrame:
    """S5: gzip-pickle `{(qid, pid): score}` -> (qid, pid, score).

    Driver-side load of a *local, trusted cache file* (the reference's
    own artifact, `BiEncoder/train.py:84-89`) — a pickle cannot be
    split across executors, so this shim exists only as a
    compatibility entry point; persist as parquet for anything big.
    """
    import gzip
    import pickle

    with gzip.open(path, "rb") as f:
        scores = pickle.load(f)
    rows = [
        (int(qid), int(pid), float(v)) for (qid, pid), v in scores.items()
    ]
    return spark.createDataFrame(
        rows, "qid LONG, pid LONG, score DOUBLE"
    )
