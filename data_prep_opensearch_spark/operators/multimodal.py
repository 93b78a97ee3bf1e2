"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container): the
default codec is a deterministic fake that "decodes" a binary payload to
a fixed-shape feature vector from its bytes, so the Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is real and tested.
Swap ``FakeCodec`` for a real decoder (PIL/ffmpeg) on a cluster where the
libs exist; everything else is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("mimetype", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),    # opaque bytes
    T.StructField("width", T.IntegerType(), True),      # typed metadata
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("payload_sha", T.StringType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), False),
])


@dataclass
class FakeCodec:
    """Deterministic stand-in decoder: features = normalized byte
    histogram folded to FEATURE_DIM. Real decoders implement the same
    two methods."""

    def decode(self, payload: bytes, mimetype: str) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float32)
        total = hist.sum()
        return hist / total if total else hist

    def frame_sample(self, payload: bytes, n_frames: int) -> list[bytes]:
        """Video frame sampling stub: deterministic byte slices."""
        step = max(1, len(payload) // n_frames)
        return [payload[i : i + step] for i in range(0, len(payload), step)][:n_frames]


class RealCodecUnavailable(FakeCodec):
    def decode(self, payload: bytes, mimetype: str) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError(
            "real image/audio decode requires PIL/ffmpeg — not in this container; "
            "use FakeCodec for plumbing tests"
        )


def extract_features(media: DataFrame, codec: FakeCodec | None = None) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary payloads in,
    fixed-dim float vectors out. Partitioning note: payloads are large —
    repartition upstream so a batch stays within Arrow limits (the
    maxRecordsPerBatch conf bounds rows; bytes/row is the real knob)."""
    c = codec or FakeCodec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, mt in zip(pdf["payload"], pdf["mimetype"]):
                raw = bytes(payload)
                feats.append(c.decode(raw, mt).tolist())
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "payload_sha": shas,
                "features": feats,
            })

    return media.select("media_id", "kind", "mimetype", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) so the
    plumbing is testable end-to-end without real files."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mts = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 7)
                rows.append((
                    i, kind, mts[kind], payload,
                    64 + i % 512 if kind == "image" else None,
                    64 + (i * 3) % 512 if kind == "image" else None,
                    1000 * (1 + i % 60) if kind != "image" else None,
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
