"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns beside a
metadata struct. Decode / feature-extraction runs as Arrow-batched
pandas iterators (``mapInPandas``) so the bytes never round-trip
through Python row objects. The decode step itself is STUBBED — the
container has no image/audio libs — but everything Spark-side is
real: schema, batch shape, partitioning, and the UDF contract. Swap
``_decode_stub`` for a PIL/torchaudio call and nothing else changes.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, crc32 bigint, "
    "width int, height int, n_frames int, decoded boolean"
)


def attach_fake_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in for real media bytes: the UTF-8 text as
    payload plus a metadata struct derived from it. Real pipelines
    read (path, bytes) from parquet/tar shards with identical shape."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            F.lit("fake/raw").alias("mime"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, width: int, height: int) -> dict:
    """STUB decode: a real implementation would decode image/audio.
    Deterministic fake: CRC of the bytes + passthrough dims."""
    return {
        "byte_len": len(payload),
        "crc32": zlib.crc32(payload),
        "width": width,
        "height": height,
        "n_frames": 1 + (len(payload) % 4),
        "decoded": True,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta).

    mapInPandas: each batch arrives as a pandas DataFrame with the
    payload as bytes — per-batch vectorizable, and partition-parallel
    across executors. No shuffle; output is map-only."""

    # self-contained closure: executors don't need csvb_spark importable
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib as _zlib

        import pandas as _pd

        def _decode(payload: bytes, width: int, height: int) -> dict:
            return {
                "byte_len": len(payload),
                "crc32": _zlib.crc32(payload),
                "width": width,
                "height": height,
                "n_frames": 1 + (len(payload) % 4),
                "decoded": True,
            }

        for pdf in batches:
            feats = [
                _decode(p, m["width"], m["height"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            out = _pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_pipeline(docs: DataFrame) -> DataFrame:
    """documents → fake payload → Arrow-batched feature extraction."""
    return extract_features(attach_fake_payload(docs))
