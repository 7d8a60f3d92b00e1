"""Streaming ingest: micro-batch normalize, dead-letter routing,
exactly-once resume across restarts (SURVEY.md §2.10)."""

import os

from pyspark.sql import functions as F

from chameleon_entity_linking_spark.sources.catalog import ParquetCatalog
from chameleon_entity_linking_spark.sources.synth import DOC_SCHEMA, SynthConfig, synth_tables
from chameleon_entity_linking_spark.streaming.incremental import (
    start_incremental_normalize,
    streaming_event_counts,
    validate_documents,
)


def _write_batch(spark, docs, path):
    docs.write.mode("overwrite").parquet(path)


class TestValidation:
    def test_dead_letter_split(self, spark):
        rows = [
            ("good", [{"kind": "text", "text": "a", "media_ref": "", "offset": 0}]),
            ("", [{"kind": "text", "text": "a", "media_ref": "", "offset": 0}]),
            ("bad_off", [{"kind": "text", "text": "a", "media_ref": "", "offset": 5}]),
        ]
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        valid, dead = validate_documents(df)
        assert [r.doc_id for r in valid.collect()] == ["good"]
        reasons = {r.doc_id: r.reason for r in dead.collect()}
        assert reasons == {"": "null_doc_id", "bad_off": "offset_order_violation"}


class TestIncrementalNormalize:
    def test_stream_appends_and_resumes(self, spark, tmp_path):
        inbox = str(tmp_path / "inbox")
        wh = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(inbox)
        t1 = synth_tables(spark, SynthConfig(n_entities=10, seed=1))["documents"]
        _write_batch(spark, t1, os.path.join(inbox, "f1"))

        q = start_incremental_normalize(spark, inbox + "/*", wh, ckpt)
        q.awaitTermination()
        catalog = ParquetCatalog(wh)
        n1 = catalog.read(spark, "doc_norm_stream").count()
        assert n1 == t1.count()

        # restart with one new file: only the delta is processed
        # (prefix ids — synth reuses the entity-id range across seeds)
        t2 = synth_tables(spark, SynthConfig(n_entities=6, seed=2))[
            "documents"
        ].withColumn("doc_id", F.concat(F.lit("x"), F.col("doc_id")))
        _write_batch(spark, t2, os.path.join(inbox, "f2"))
        q2 = start_incremental_normalize(spark, inbox + "/*", wh, ckpt)
        q2.awaitTermination()
        out = catalog.read(spark, "doc_norm_stream")
        assert out.count() == n1 + t2.count()
        # no duplicates across restarts (exactly-once per file)
        assert out.select("doc_id").distinct().count() == out.count()

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        # crash-between-commits simulation: the catalog commit landed
        # but the streaming checkpoint did not (foreachBatch is
        # at-least-once). Deleting the checkpoint replays every batch
        # id from 0; the batch_id-idempotent catalog write must skip
        # them all — no duplicated rows, no new snapshots.
        import shutil

        inbox = str(tmp_path / "inbox")
        wh = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(inbox)
        t1 = synth_tables(spark, SynthConfig(n_entities=8, seed=4))["documents"]
        _write_batch(spark, t1, os.path.join(inbox, "f1"))
        start_incremental_normalize(spark, inbox + "/*", wh, ckpt).awaitTermination()
        catalog = ParquetCatalog(wh)
        n1 = catalog.read(spark, "doc_norm_stream").count()
        snap1 = catalog.current_snapshot("doc_norm_stream").snapshot_id

        shutil.rmtree(ckpt)  # lose the stream checkpoint, keep the catalog
        start_incremental_normalize(spark, inbox + "/*", wh, ckpt).awaitTermination()
        assert catalog.read(spark, "doc_norm_stream").count() == n1
        assert catalog.current_snapshot("doc_norm_stream").snapshot_id == snap1

    def test_third_restart_is_noop(self, spark, tmp_path):
        inbox = str(tmp_path / "inbox")
        wh = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(inbox)
        t1 = synth_tables(spark, SynthConfig(n_entities=5, seed=3))["documents"]
        _write_batch(spark, t1, os.path.join(inbox, "f1"))
        start_incremental_normalize(spark, inbox + "/*", wh, ckpt).awaitTermination()
        catalog = ParquetCatalog(wh)
        snap_before = catalog.current_snapshot("doc_norm_stream").snapshot_id
        start_incremental_normalize(spark, inbox + "/*", wh, ckpt).awaitTermination()
        assert (
            catalog.current_snapshot("doc_norm_stream").snapshot_id
            == snap_before
        )


class TestStreamingWindows:
    def test_event_counts_match_batch(self, spark, tmp_path):
        # file-stream sources need a directory; stage the single file
        path = "/root/testdata/sf0.001/events.parquet"
        stream_dir = str(tmp_path / "events_in")
        os.makedirs(stream_dir)
        import shutil

        shutil.copy(path, os.path.join(stream_dir, "events.parquet"))
        got = streaming_event_counts(spark, stream_dir)
        ev = spark.read.parquet(path)
        expected = (
            ev.groupBy(F.window(F.col("ts").cast("timestamp"), "5 minutes"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .count()
        )
        assert got.count() == expected
        assert got.agg(F.sum("n_events")).collect()[0][0] == ev.count()


class TestNullOffsetValidation:
    def test_null_offsets_are_dead_lettered(self, spark):
        """NULL span offsets violate offset == position; three-valued
        logic must not let them slip through as valid."""
        rows = [
            ("n1", [{"kind": "text", "text": "a", "media_ref": "", "offset": None}]),
            ("n2", [
                {"kind": "text", "text": "a", "media_ref": "", "offset": 0},
                {"kind": "text", "text": "b", "media_ref": "", "offset": None},
            ]),
            ("ok", [{"kind": "text", "text": "a", "media_ref": "", "offset": 0}]),
        ]
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        valid, dead = validate_documents(df)
        assert [r.doc_id for r in valid.collect()] == ["ok"]
        assert {r.doc_id: r.reason for r in dead.collect()} == {
            "n1": "offset_order_violation",
            "n2": "offset_order_violation",
        }
