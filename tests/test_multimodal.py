"""Multimodal plumbing: binary payloads through Arrow, batch shapes,
feature extraction, frame sampling."""

import numpy as np
from pyspark.sql import functions as F

from chameleon_entity_linking_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    media_refs_from_documents,
    sample_video_frames,
    synth_media_table,
)
from chameleon_entity_linking_spark.sources.synth import SynthConfig, synth_tables


def _media(spark):
    docs = synth_tables(spark, SynthConfig(n_entities=30, seed=11))["documents"]
    refs = media_refs_from_documents(docs)
    return synth_media_table(spark, refs)


class TestMediaTable:
    def test_schema_and_payloads(self, spark):
        media = _media(spark)
        assert media.schema.simpleString() == (
            "struct<media_ref:string,kind:string,payload:binary,"
            "meta:struct<width:int,height:int,duration_ms:int>>"
        )
        rows = media.collect()
        assert len(rows) > 0
        for r in rows[:5]:
            assert len(bytes(r.payload)) == 256
            assert r.meta.width >= 16 and r.meta.height >= 16
            assert (r.kind == "video") == (r.meta.duration_ms > 0)

    def test_payload_deterministic_per_ref(self, spark):
        a = {r.media_ref: bytes(r.payload) for r in _media(spark).collect()}
        b = {r.media_ref: bytes(r.payload) for r in _media(spark).collect()}
        assert a == b


class TestFeatureExtraction:
    def test_features_fixed_dim_normalized(self, spark):
        feats = extract_media_features(_media(spark)).collect()
        assert len(feats) > 0
        for r in feats[:5]:
            v = np.asarray(r.feature, dtype=np.float32)
            assert v.shape == (FEATURE_DIM,)
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        # payload column must not survive (no binary past the map)
        cols = extract_media_features(_media(spark)).columns
        assert "payload" not in cols

    def test_same_ref_same_feature(self, spark):
        f = extract_media_features(_media(spark))
        dup = f.groupBy("media_ref").agg(
            F.countDistinct(F.to_json(F.struct("feature"))).alias("n")
        )
        assert dup.where("n > 1").count() == 0


class TestFrameSampling:
    def test_one_row_per_frame(self, spark):
        media = _media(spark)
        frames = sample_video_frames(media, every_ms=1000)
        vids = {r.media_ref: r.meta.duration_ms for r in media.where("kind = 'video'").collect()}
        got = (
            frames.groupBy("media_ref")
            .agg(F.count("*").alias("n"), F.max("frame_ts_ms").alias("mx"))
            .collect()
        )
        assert len(got) == len(vids)
        for r in got:
            expected = max(vids[r.media_ref] // 1000, 1)
            assert r.n == expected
            assert r.mx == (expected - 1) * 1000

    def test_images_produce_no_frames(self, spark):
        media = _media(spark)
        frames = sample_video_frames(media)
        joined = frames.join(
            media.where("kind = 'image'").select("media_ref"), "media_ref"
        )
        assert joined.count() == 0
