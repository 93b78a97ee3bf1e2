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


TEXT_DETECT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("has_pk_header", T.BooleanType(), False),
    T.StructField("n_nul", T.LongType(), False),
    T.StructField("nonprintable_ratio", T.DoubleType(), False),
    T.StructField("is_binary", T.BooleanType(), False),
])

# printable whitelist: 0x20-0x7E plus TAB/LF/CR — the reference's
# byte-class test (stages/enricher/utils.py:206-213)
_PRINTABLE = np.zeros(256, dtype=bool)
_PRINTABLE[32:127] = True
_PRINTABLE[[9, 10, 13]] = True
NONPRINTABLE_MAX_RATIO = 0.05
_PK_HEADER = b"PK\x03\x04"


def detect_binary_payloads(
    df: DataFrame, payload_col: str = "payload", key: str = "media_id"
) -> DataFrame:
    """Binary-payload text detector (P10 — the standard training-data
    garbage filter; reference stages/enricher/utils.py:194-216): a
    payload is binary when it starts with the PK zip header, contains a
    NUL byte, or is more than 5% nonprintable bytes (printable = ASCII
    0x20-0x7E plus TAB/LF/CR). Arrow-batched; byte counting is numpy
    (frombuffer + boolean-mask sum), never per-byte Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, pks, nuls, ratios, bins = [], [], [], [], [], []
            for mid, payload in zip(pdf[key], pdf[payload_col]):
                raw = bytes(payload)
                arr = np.frombuffer(raw, dtype=np.uint8)
                n = arr.size
                pk = raw[:4] == _PK_HEADER
                n_nul = int((arr == 0).sum())
                ratio = (float((~_PRINTABLE[arr]).sum()) / n) if n else 0.0
                ids.append(int(mid))
                sizes.append(n)
                pks.append(pk)
                nuls.append(n_nul)
                ratios.append(round(ratio, 6))
                bins.append(pk or n_nul > 0 or ratio > NONPRINTABLE_MAX_RATIO)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "has_pk_header": pks,
                "n_nul": pd.Series(nuls, dtype="int64"),
                "nonprintable_ratio": pd.Series(ratios, dtype="float64"),
                "is_binary": bins,
            })

    return df.select(key, payload_col).mapInPandas(run, TEXT_DETECT_SCHEMA)


# fixed text blocks for the synthetic payload table — module constants so
# the SQL oracle can embed their exact lengths/compositions
_PAYLOAD_TEXT = "def f():\n    return 1\n"
_PAYLOAD_CRLF = "line1\r\n\tline2 "
_PAYLOAD_CONF = "config " * 5
_PAYLOAD_PK_TAIL = "README text content "


def synthetic_payloads_df(spark, n: int = 100) -> DataFrame:
    """Deterministic mixed text/binary payload table for the P10 detector:
    case i%5 == 0 -> PK-header file, 1 -> clean ASCII source text,
    2 -> text with embedded NULs, 3 -> repeated sha256 digest (random
    bytes), 4 -> text with CRLF/TAB whitespace. Cases 1 and 4 are TEXT;
    0, 2, 3 are BINARY — each through a different rule."""

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                case = i % 5
                if case == 0:
                    payload = _PK_HEADER + (
                        _PAYLOAD_PK_TAIL * (1 + i % 3)
                    ).encode()
                elif case == 1:
                    payload = (_PAYLOAD_TEXT * (1 + i % 4)).encode()
                elif case == 2:
                    payload = _PAYLOAD_CONF.encode() + b"\x00\x00"
                elif case == 3:
                    payload = hashlib.sha256(f"bin{i}".encode()).digest() * (
                        2 + i % 3
                    )
                else:
                    payload = (_PAYLOAD_CRLF * (2 + i % 2)).encode()
                rows.append((i, payload))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    # few, explicit partitions: these synthetic tables are small, and a
    # default-parallelism range spawns one python worker per core for a
    # 100-row table (measured seconds of pure worker startup)
    return spark.range(0, n, 1, min(8, n)).mapInPandas(gen, schema)


def media_eligibility(
    media: DataFrame,
    max_file_size_bytes: int = 300,
    max_image_dim: int = 400,
    max_media_duration_sec: int = 45,
) -> DataFrame:
    """P7 eligibility guardrails over TYPED media metadata — the
    reference's size / image-dimension / media-duration caps
    (api/mysql_store.py:801-838), as an ordered when-chain (first failing
    rule names the reason; the text-size axis lives in rel_eligibility).
    Pure JVM expressions; at scale this is a codegen'd scan predicate."""
    size = F.length(F.col("payload"))
    dim = F.greatest(F.col("width"), F.col("height"))
    reason = (
        F.when(size > max_file_size_bytes, F.lit("file_too_large"))
        .when(
            (F.col("kind") == "image") & (dim > max_image_dim),
            F.lit("image_dimension_limit"),
        )
        .when(
            F.col("kind").isin("audio", "video")
            & (F.col("duration_ms") > max_media_duration_sec * 1000),
            F.lit("media_duration_limit"),
        )
    )
    return media.select(
        "media_id",
        "kind",
        size.cast("long").alias("n_bytes"),
        F.when(reason.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("eligible"),
        reason.alias("reason"),
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

    return spark.range(0, n, 1, min(8, n)).mapInPandas(gen, MEDIA_SCHEMA)
