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


RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, resized boolean"
)

FRAME_SCHEMA = (
    "doc_id bigint, frame_id int, frame_bytes binary, frame_len int, frame_crc bigint"
)


def resize(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Arrow-batched resize stage. STUB: a real implementation decodes
    and rescales pixels; the deterministic fake truncates/pads the
    payload to width*height bytes so downstream stages see the
    contracted byte budget. Map-only, 1 row in → 1 row out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        target = width * height

        for pdf in batches:
            out_payload = [
                bytes(p[:target]).ljust(target, b"\x00") for p in pdf["payload"]
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": out_payload,
                    "width": width,
                    "height": height,
                    "resized": True,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: 1 media row → n_frames frame rows (the
    generator shape of a video pipeline). STUB decode: frame i is the
    i-th equal slice of the payload; a real implementation seeks
    keyframes. Still map-only — the explosion happens inside the
    Arrow batch, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib as _zlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            # All slice math is NumPy index arithmetic over ONE
            # contiguous buffer: per-payload offsets from a cumsum,
            # an (n_frames × n) grid of clamped starts/lengths, then
            # a single ravel into the output columns. Per-row Python
            # remains only where Arrow's binary column forces a bytes
            # object (the .tobytes() gather) and for crc32 (a C call
            # per slice) — exactly the two spots a real decoder
            # replaces.
            pays = [bytes(p) for p in pdf["payload"]]
            lens = _np.fromiter(map(len, pays), dtype=_np.int64, count=n)
            offs = _np.zeros(n + 1, dtype=_np.int64)
            _np.cumsum(lens, out=offs[1:])
            buf = memoryview(b"".join(pays))
            steps = _np.maximum(lens // n_frames, 1)
            frame_idx = _np.arange(n_frames, dtype=_np.int64)[:, None]
            starts = _np.minimum(steps[None, :] * frame_idx, lens[None, :])
            flens = _np.minimum(steps[None, :], lens[None, :] - starts)
            gstarts = (offs[:-1][None, :] + starts).ravel()
            gends = (gstarts + flens.ravel())
            fb = [
                buf[s:e].tobytes()
                for s, e in zip(gstarts.tolist(), gends.tolist())
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": _np.tile(pdf["doc_id"].values, n_frames),
                    "frame_id": _np.repeat(
                        _np.arange(n_frames, dtype=_np.int32), n
                    ),
                    "frame_bytes": fb,
                    "frame_len": flens.ravel().astype(_np.int32),
                    "frame_crc": [_zlib.crc32(x) for x in fb],
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def multimodal_pipeline(docs: DataFrame) -> DataFrame:
    """documents → fake payload → Arrow-batched feature extraction."""
    return extract_features(attach_fake_payload(docs))


def frame_pipeline(docs: DataFrame, n_frames: int = 4) -> DataFrame:
    """documents → payload → resize → frame sampling: the full
    multimodal plumbing chain (all mapInPandas, zero shuffles)."""
    return sample_frames(resize(attach_fake_payload(docs)), n_frames)
