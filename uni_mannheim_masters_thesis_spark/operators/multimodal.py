"""Multimodal column plumbing (SURVEY §2.11).

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators.
The decode kernels themselves are STUBBED behind ``_decode_stub`` (the
image/audio libraries are not in this container — BASELINE.json scope
note); everything Spark-side is real and tested: schema contract,
binary column handling, batch iteration shape, partition-parallel
execution, deterministic fake features.

At 100 TB: binary payloads stay columnar in parquet, the scan is
embarrassingly parallel, and each Arrow batch crosses the JVM↔Python
boundary once (no per-row pickling). Swap ``_decode_stub`` for a real
PIL/ffmpeg call and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, sha256 string, width int, height int, "
    "feature array<double>"
)

FEATURE_DIM = 8


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder standing in for PIL/ffmpeg.

    Real decode (image dims, pixel features) is NOT implemented in this
    container; this derives stable pseudo-metadata from the payload
    digest so the pipeline is testable end-to-end. sha256 on purpose:
    both Spark (sha2) and DuckDB expose it, so the stub's outputs are
    exactly replayable by the correctness oracle.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [b / 255.0 for b in digest[2 : 2 + FEATURE_DIM]]
    return width, height, feature


def decode_binary_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload → metadata + feature vector."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            width, height, feature = _decode_stub(data)
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(data),
                    "sha256": hashlib.sha256(data).hexdigest(),
                    "width": width,
                    "height": height,
                    "feature": feature,
                }
            )
        yield pd.DataFrame(rows)


def decode_binary_column(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Run the (stubbed) decoder over a binary column, Arrow-batched."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(decode_binary_batch, schema=DECODE_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Testdata adapter: treat the UTF-8 text payload as the opaque
    binary column (the testdata ships no real image bytes)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "ok_fits boolean"
)

RESIZE_BOX = 224  # target bounding box (the ViT-style model input)


def resize_binary_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: aspect-preserving fit of each payload's
    (stub-decoded) dimensions into a RESIZE_BOX square — downscale
    only, never upscale. The pixel resample itself is the stubbed
    step (PIL not in container); the geometry, batch shape, and
    Arrow plumbing are real, and the geometry is pure IEEE double
    math replayable by the oracle."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            width, height, _ = _decode_stub(bytes(payload))
            scale = min(RESIZE_BOX / width, RESIZE_BOX / height, 1.0)
            out_w = int(width * scale)
            out_h = int(height * scale)
            rows.append(
                {
                    "doc_id": doc_id,
                    "width": width,
                    "height": height,
                    "out_width": out_w,
                    "out_height": out_h,
                    "ok_fits": 1 <= out_w <= RESIZE_BOX
                    and 1 <= out_h <= RESIZE_BOX,
                }
            )
        yield pd.DataFrame(rows)


def resize_binary_column(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Run the (geometry-real, resample-stubbed) resizer over a binary
    column, Arrow-batched."""
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )
    return src.mapInPandas(resize_binary_batch, schema=RESIZE_SCHEMA)
