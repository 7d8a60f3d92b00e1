"""Multimodal media operators: opaque binary payloads + typed metadata.

Media spans in the documents table carry only ``media_ref`` content
hashes (the exact-match key). This module is the sidecar *media
table* and its processing operators — the shape a training-data
pipeline needs for image/audio/video columns at scale:

    media(media_ref string, kind string, payload binary,
          meta struct<width:int, height:int, duration_ms:int>)

Real decode libraries are not in this container, so the decode step
is STUBBED with a deterministic fake (`_fake_decode`) clearly marked
below — but the Spark-side plumbing is real and tested: binary
columns through Arrow, `mapInPandas` batch iteration, fixed-dim
feature output schema, per-partition batch shapes, frame-sampling
fan-out (one row per sampled frame).

Scale notes: payloads never pass through a shuffle — features are
extracted map-side and only the (media_ref, feature) projection
continues; joins back to documents go through the small feature
table (broadcast when it fits).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int>"
)
FEATURE_DIM = 32


def synth_media_table(
    spark: SparkSession, refs: DataFrame, payload_bytes: int = 256
) -> DataFrame:
    """Deterministic fake media sidecar for a set of media_refs.

    ``refs``: DataFrame with a ``media_ref`` column (e.g. exploded from
    documents). Payload = repeated md5 stream of the ref (content hash
    consistency: same ref -> same payload).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                stream = b""
                seed = ref.encode()
                while len(stream) < payload_bytes:
                    seed = hashlib.md5(seed).digest()
                    stream += seed
                h0 = stream[0]
                kind = "video" if ref[-1] in "012" else "image"
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": kind,
                        "payload": stream[:payload_bytes],
                        "meta": {
                            "width": 16 + (h0 % 16) * 16,
                            "height": 16 + (stream[1] % 16) * 16,
                            "duration_ms": (
                                1000 + stream[2] * 100 if kind == "video" else 0
                            ),
                        },
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "kind", "payload", "meta"]
            )

    return refs.select("media_ref").distinct().mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB — deterministic stand-in for a real image/audio decoder.

    A real deployment replaces this with PIL/torchvision/ffmpeg
    decoding; everything around it (Arrow binary transfer, batch
    iteration, output schema) stays identical.
    """
    h = hashlib.md5(payload).digest() * ((dim * 4) // 16 + 1)
    vec = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
    vec = (vec % 1000) / 1000.0
    n = np.linalg.norm(vec)
    return vec / n if n else vec


def extract_media_features(media: DataFrame) -> DataFrame:
    """(media_ref, kind, payload, meta) -> (media_ref, kind, feature).

    mapInPandas so the decoder initializes once per partition and
    sees whole Arrow batches (the operator shape of B1 batched
    inference) — payload column is dropped on output, so downstream
    stages never shuffle binary data.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(
        run, "media_ref string, kind string, feature array<float>"
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling: one output row per sampled frame timestamp.

    JVM-side fan-out (`sequence` + `explode`) — only frame *indices*
    are generated here; per-frame decode happens in
    `extract_media_features` on the (ref, frame_ts) projection. At
    scale this is the standard explode-then-process layout: fan-out is
    bounded by duration/every_ms, and no binary payload is replicated.
    """
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / every_ms).cast("int") - 1,
                    F.lit(0),
                ),
            )
        ).alias("frame_idx"),
    ).select(
        "media_ref",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    )


def media_refs_from_documents(documents: DataFrame) -> DataFrame:
    return documents.select(
        F.explode(
            F.filter("spans", lambda s: s["media_ref"] != F.lit(""))
        ).alias("s")
    ).select(F.col("s.media_ref").alias("media_ref"))
