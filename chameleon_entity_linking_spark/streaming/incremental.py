"""Incremental ingest: Structured Streaming over arriving documents.

The reference's only "streaming" is resumable batched extraction —
append-mode TSV + ``--start_index`` cursors + a dead-letter file
(`utils/entity_extractor.py:12,33-38,51`; SURVEY.md §2.10 T1-T4).
This module is the Spark-native version: a file-source stream over
the documents directory, normalized per micro-batch inside
``foreachBatch``, committed to the catalog as *append* snapshots with
the batch id in lineage, with malformed rows routed to an ``errors``
table. The stream checkpoint plus a batch_id-idempotent catalog
commit give exactly-once per-file processing across restarts (the
--start_index analogue, but transactional): foreachBatch alone is
at-least-once, so ``process_batch`` skips batch ids the catalog
lineage already records as committed.

Scale notes: file-source streaming is the local stand-in for
Kafka/queue sources; the per-batch body is the same `normalize`
operator the batch pipeline uses (map-only, no shuffle), so the
streaming path inherits its scaling behavior. `maxFilesPerTrigger`
bounds micro-batch size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chameleon_entity_linking_spark.operators.normalize import normalize
from chameleon_entity_linking_spark.sources.catalog import ParquetCatalog
from chameleon_entity_linking_spark.sources.synth import DOC_SCHEMA


def validate_documents(batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a raw batch into (valid, dead_letter).

    Dead-letter conditions (K3/T4 analogue): null/empty doc_id, null
    spans, or a span violating the invariant offset == position.
    """
    checked = batch.withColumn(
        "reason",
        F.when(
            F.col("doc_id").isNull() | (F.col("doc_id") == ""), "null_doc_id"
        )
        .when(F.col("spans").isNull(), "null_spans")
        .when(
            # null-safe: a NULL offset violates offset == position; a
            # bare `s.offset = i` yields NULL under three-valued
            # logic, exists() returns NULL, and the row would slip
            # through as valid
            F.exists(
                F.expr(
                    "transform(spans,"
                    " (s, i) -> coalesce(s.offset = i, false))"
                ),
                lambda ok: ~ok,
            ),
            "offset_order_violation",
        )
        .otherwise(F.lit(None)),
    )
    valid = checked.where(F.col("reason").isNull()).drop("reason")
    dead = checked.where(F.col("reason").isNotNull()).select(
        "doc_id", "reason"
    )
    return valid, dead


def start_incremental_normalize(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
):
    """Start the stream; returns the StreamingQuery.

    Callers drive it with ``query.processAllAvailable()`` (tests/local)
    or leave it running (service mode).
    """
    catalog = ParquetCatalog(warehouse)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    # Stream-incarnation identity for the idempotence guard: batch ids
    # are only monotonic per CHECKPOINT — reusing a warehouse with a
    # fresh checkpoint restarts them at 0, which would make a
    # batch_id-only guard spuriously true and silently skip commits
    # (including dead-letter rows). Committing the checkpoint path in
    # lineage and requiring it to match pins the guard to this stream;
    # a different incarnation falls back to replay (append-mode
    # at-least-once, never silent loss). URI checkpoint locations
    # (hdfs://, s3a://) are already absolute and cwd-independent —
    # abspath would mangle them into a cwd-relative local path and
    # void the guard across service restarts from a different cwd.
    stream_id = (
        checkpoint_dir
        if "://" in checkpoint_dir
        else os.path.abspath(checkpoint_dir)
    )

    def _committed(table: str, batch_id: int) -> bool:
        snap = (
            catalog.current_snapshot(table) if catalog.exists(table) else None
        )
        return (
            snap is not None
            and snap.lineage.get("stream_id") == stream_id
            and snap.lineage.get("batch_id", -1) >= batch_id
        )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        # idempotence ACROSS restarts: foreachBatch is at-least-once —
        # a crash between a catalog commit and the streaming
        # checkpoint commit replays this batch_id on restart. Batch ids
        # are monotonic per checkpoint and the catalog lineage records
        # them, so an already-committed batch_id is a no-op replay.
        # The guard is PER TABLE: the two commits below are not one
        # transaction, so a crash between them must replay only the
        # missing one — a single doc_norm_stream-side check would
        # silently drop the batch's dead-letter rows on replay.
        norm_done = _committed("doc_norm_stream", batch_id)
        errors_done = _committed("errors", batch_id)
        if norm_done and errors_done:
            return
        # persist the deduped batch: the valid/dead split below feeds
        # MULTIPLE actions (dead probe, errors write, norm write), and
        # dropDuplicates picks an ARBITRARY survivor per evaluation —
        # unpinned, a doc_id with both a valid and a malformed copy
        # could land in neither table (one action's evaluation keeps
        # the valid copy, another's the malformed one)
        deduped = batch.dropDuplicates(["doc_id"]).persist()
        # try/finally: a failed dead-letter probe or catalog write must
        # not leak the persisted batch block — each failed-batch retry
        # re-persists a new one in a long-running stream (ADVICE r5)
        try:
            valid, dead = validate_documents(deduped)
            # dead-letter FIRST: if the batch has malformed rows, a
            # crash after this commit replays into the norm_done-only
            # branch; the errors lineage then proves this batch's dead
            # rows exist. (A batch with no dead rows never advances
            # the errors lineage; its replay recomputes an empty
            # `dead` — still a no-op, just a recomputation.)
            if not errors_done and dead.take(1):
                catalog.write(
                    "errors",
                    dead.withColumn("batch_id", F.lit(batch_id)),
                    mode="append",
                    lineage={
                        "stage": "dead_letter",
                        "batch_id": batch_id,
                        "stream_id": stream_id,
                    },
                )
            if not norm_done:
                catalog.write(
                    "doc_norm_stream",
                    normalize(valid),
                    mode="append",
                    lineage={
                        "stage": "stream_normalize",
                        "batch_id": batch_id,
                        "stream_id": stream_id,
                    },
                    metrics={"batch_id": batch_id},
                )
        finally:
            deduped.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_event_counts(spark: SparkSession, events_path: str) -> DataFrame:
    """Watermarked tumbling-window aggregation over the events table
    driven as a stream (the Structured Streaming form of the batch
    `events_tumbling` query) — returns the final materialized result.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_event_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("select * from stream_event_counts")
