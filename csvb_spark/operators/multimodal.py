"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns beside a
metadata struct. Decode / feature-extraction runs as Arrow-batched
pandas iterators (``mapInPandas``) so the bytes never round-trip
through Python row objects. Decode is REAL for WAV/PCM (stdlib
``wave``), PPM(P6)/24-bit BMP (NumPy), PNG (round 6: stdlib zlib
inflate + scanline unfiltering), and baseline JPEG (round 7: full
entropy decode — canonical Huffman from DHT, DC prediction,
run-length AC, dequantize + IDCT + YCbCr→RGB, stdlib + NumPy only).
Only audio codecs needing external libraries (MP3) still fall
through ``decoded=false``; everything Spark-side — schema, batch
shape, partitioning, the UDF contract — is identical either way, so
a torchaudio branch drops into the same sniff dispatch.
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


# --- round 5: REAL decode for codec-free formats ----------------------
# The container has no image/audio codec libraries, but WAV/PCM is
# parseable with the stdlib `wave` module and PPM(P6)/BMP(24-bit) with
# NumPy alone — so for those formats decode is now REAL, not stubbed:
# bytes are parsed, samples/pixels are materialized, and features are
# computed from the actual signal. Compressed formats (JPEG/MP3/MP4)
# still fall through to the clearly-marked fallback with
# decoded=false. Everything stays mapInPandas/zero-shuffle.

DECODED_SCHEMA = (
    "doc_id bigint, kind string, byte_len int, width int, height int, "
    "n_channels int, sample_rate int, n_samples bigint, duration_ms double, "
    "rms double, peak double, mean_r double, mean_g double, mean_b double, "
    "decoded boolean"
)


def _nonneg_ids(docs: DataFrame, id_col: str) -> DataFrame:
    """In-plan guard shared by every synthesizer: the id-derived byte
    arithmetic uses Python ``%``, which is non-negative for negative
    ids while SQL's ``%`` follows the sign — a negative id would
    silently diverge from the x66/x85/x87/x88 oracles instead of
    failing cleanly. JVM-side ``assert_true`` (the calibrate pattern)
    rather than a check inside each mapInPandas closure: one copy,
    and the closures stay free of module-level names (worker-side
    pickle hygiene)."""
    ok = F.col(id_col) >= 0
    guarded = F.when(ok, F.col(id_col)).otherwise(
        F.assert_true(
            ok, F.lit("synthesize: doc ids must be non-negative")
        ).cast("bigint")
    )
    return docs.select(guarded.alias(id_col))


def synthesize_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media bytes per document: even ids get a
    mono 16-bit PCM WAV (8 kHz sine, length/frequency derived from the
    id), odd ids a binary P6 PPM (gradient pattern, dims derived from
    the id). The bytes are genuine format-conformant files — any
    external WAV/PPM reader opens them — so the decode stage is tested
    against real payloads, not markers. Map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        def _wav(doc_id: int) -> bytes:
            sr = 8000
            n = 800 + (doc_id % 17) * 40
            freq = 220 + (doc_id % 13) * 20
            t = _np.arange(n, dtype=_np.float64)
            samples = (12000.0 * _np.sin(2.0 * _np.pi * freq * t / sr)).astype(
                _np.int16
            )
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(samples.tobytes())
            return buf.getvalue()

        def _ppm(doc_id: int) -> bytes:
            w = 8 + (doc_id % 9)
            h = 6 + (doc_id % 7)
            y, x = _np.mgrid[0:h, 0:w]
            px = _np.stack(
                [
                    (x * 3 + doc_id) % 256,
                    (y * 7 + doc_id) % 256,
                    (x + y + doc_id) % 256,
                ],
                axis=-1,
            ).astype(_np.uint8)
            return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()

        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        _wav(i) if i % 2 == 0 else _ppm(i) for i in ids
                    ],
                    "mime": [
                        "audio/wav" if i % 2 == 0 else "image/x-portable-pixmap"
                        for i in ids
                    ],
                }
            )

    return _nonneg_ids(docs, id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary, mime string"
    )


def synthesize_png(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL PNG bytes per document — a genuinely
    COMPRESSED format (zlib DEFLATE, stdlib), unlike the raw-pixel
    PPM/BMP payloads: 8-bit truecolor, per-row scanline filters
    cycling None/Sub/Up so the decoder's unfilter logic is exercised,
    pixel values arithmetic in ``doc_id`` so a SQL oracle can predict
    the decoded channel means without touching a byte. Map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import numpy as _np
        import pandas as _pd

        def _chunk(typ: bytes, data: bytes) -> bytes:
            return (
                _struct.pack("!I", len(data))
                + typ
                + data
                + _struct.pack("!I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        def _png(doc_id: int) -> bytes:
            w = 5 + doc_id % 7
            h = 4 + doc_id % 5
            y, x = _np.mgrid[0:h, 0:w]
            px = _np.stack(
                [
                    (x * 5 + doc_id) % 256,
                    (y * 11 + doc_id) % 256,
                    (x * y + doc_id) % 256,
                ],
                axis=-1,
            ).astype(_np.uint8)
            stride = w * 3
            prev = _np.zeros(stride, dtype=_np.int64)
            scanlines = []
            for yy in range(h):
                line = px[yy].reshape(-1).astype(_np.int64)
                f = yy % 3
                if f == 0:  # None
                    filt = line
                elif f == 1:  # Sub (bpp = 3)
                    filt = line.copy()
                    filt[3:] = (line[3:] - line[:-3]) % 256
                else:  # Up
                    filt = (line - prev) % 256
                scanlines.append(
                    bytes([f]) + filt.astype(_np.uint8).tobytes()
                )
                prev = line
            ihdr = _struct.pack("!IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", _zlib.compress(b"".join(scanlines)))
                + _chunk(b"IEND", b"")
            )

        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_png(i) for i in ids],
                    "mime": ["image/png"] * len(ids),
                }
            )

    return _nonneg_ids(docs, id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary, mime string"
    )


def synthesize_gif(
    docs: DataFrame,
    id_col: str = "doc_id",
    upscale: int = 1,
    noisy: bool = False,
) -> DataFrame:
    """Deterministic REAL GIF87a bytes per document — the LAST
    stdlib-expressible image codec family: palette-indexed pixels
    compressed with genuine variable-width LZW (9→12-bit codes,
    LSB-first packing, clear/EOI codes, 4096-entry table reset), so
    the decoder's full LZW state machine is exercised. The global
    palette is arithmetic (``palette[i] = (i, 3i mod 256, 7i mod
    256)``) and the pixel index field is arithmetic in ``(x, y,
    doc_id)``, so a SQL oracle predicts the decoded channel means
    without touching a byte. Map-only.

    ``upscale``/``noisy`` exist for the deep-LZW tests only (x139
    keeps the defaults): fixture-sized images never push the code
    table past 9-bit codes, so tests scale the canvas up and switch
    the index field to an incompressible mix to drive the table
    through every width bump and past the 4096-entry CLEAR/reset —
    both knobs stay numpy-predictable."""
    if upscale < 1:
        # fail on the driver: upscale=0 would make empty canvases and
        # surface as an opaque executor-side KeyError inside the LZW
        raise ValueError(f"upscale must be >= 1, got {upscale}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def _lzw(indices: bytes, mcs: int = 8) -> bytes:
            # GIF-spec LZW: the code stream starts with CLEAR, ends
            # with EOI, grows one bit exactly when the next assignable
            # code value would not fit the current width (encoder and
            # decoder stay in lockstep because both count assignments
            # at the same stream positions), and resets via CLEAR at
            # table entry 4096. LSB-first bit packing per the spec.
            clear, eoi = 1 << mcs, (1 << mcs) + 1
            out = bytearray()
            acc = nbits = 0

            def emit(code: int, width: int) -> None:
                nonlocal acc, nbits
                acc |= code << nbits
                nbits += width
                while nbits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8

            table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
            next_code, cs = eoi + 1, mcs + 1
            emit(clear, cs)
            w = indices[:1]
            for b in indices[1:]:
                wc = w + bytes([b])
                if wc in table:
                    w = wc
                    continue
                emit(table[w], cs)
                if next_code < 4096:
                    table[wc] = next_code
                    if next_code == (1 << cs) and cs < 12:
                        cs += 1
                    next_code += 1
                else:
                    emit(clear, cs)
                    table = {bytes([i]): i for i in range(clear)}
                    next_code, cs = eoi + 1, mcs + 1
                w = bytes([b])
            emit(table[w], cs)
            emit(eoi, cs)
            if nbits:
                out.append(acc & 0xFF)
            return bytes(out)

        palette = bytes(
            v for i in range(256) for v in (i, (i * 3) % 256, (i * 7) % 256)
        )

        def _gif(doc_id: int) -> bytes:
            w = (6 + doc_id % 9) * upscale
            h = (5 + doc_id % 7) * upscale
            y, x = _np.mgrid[0:h, 0:w]
            if noisy:
                idx = (
                    (x * 197 + y * 101 + (x * y) % 251 + doc_id) % 256
                ).astype(_np.uint8)
            else:
                idx = ((x * 5 + y * 11 + doc_id) % 256).astype(_np.uint8)
            lzw = _lzw(idx.tobytes())
            blocks = b"".join(
                bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
                for i in range(0, len(lzw), 255)
            )
            return (
                b"GIF87a"
                + _struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # LSD: 256-color GCT
                + palette
                + b"\x2c"
                + _struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
                + bytes([8])  # LZW min code size
                + blocks
                + b"\x00\x3b"  # block terminator + trailer
            )

        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_gif(i) for i in ids],
                    "mime": ["image/gif"] * len(ids),
                }
            )

    return _nonneg_ids(docs, id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary, mime string"
    )


def synthesize_jpeg(
    docs: DataFrame, id_col: str = "doc_id", mode: str = "flat"
) -> DataFrame:
    """Deterministic REAL baseline JPEG (JFIF) bytes per document —
    the full entropy-coded format: quantization tables, canonical
    Huffman tables (written into DHT segments, not assumed), DC
    prediction, run-length AC coding, byte stuffing. Stdlib + NumPy
    only, like the PNG path (``synthesize_png``).

    ``mode='flat'``: every 8×8 block is a constant gray (Cb=Cr=128),
    the luma value arithmetic in ``doc_id`` and the block position.
    With a uniform quantizer of 8 the DC round trip is EXACT for
    constant blocks (DC = 8·(v-128), quantized by 8 losslessly), so
    the decoded channel means are predictable by a SQL oracle from
    ``doc_id`` alone (x87) even though the codec is lossy in general.

    ``mode='gradient'``: per-pixel luma gradients and non-neutral
    per-block chroma — blocks carry real AC coefficients, exercising
    zigzag, run-length/ZRL coding, and the chroma reconstruction.
    Lossy; tests compare against an independent replay of the same
    quantize→dequantize→IDCT arithmetic.

    Map-only; one task per input partition.
    """
    if mode not in ("flat", "gradient"):
        raise ValueError(f"synthesize_jpeg: unknown mode {mode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        # natural-order (i, j) for zigzag position k — even diagonals
        # walk up-right, odd walk down-left (the JPEG scan order)
        zz = sorted(
            ((i, j) for i in range(8) for j in range(8)),
            key=lambda t: (t[0] + t[1], t[0] if (t[0] + t[1]) % 2 else -t[0]),
        )
        # 2-D DCT-II basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16);
        # coef = A @ block @ A.T for the level-shifted block
        ax = _np.arange(8)
        A = _np.cos((2 * ax[None, :] + 1) * ax[:, None] * _np.pi / 16) / 2.0
        A[0, :] /= _np.sqrt(2.0)
        Q = 8  # uniform quantizer: exact for constant blocks (see doc)

        # canonical Huffman: all 12 DC categories at code length 4,
        # all 162 AC symbols at length 8 → code i for the i-th symbol
        dc_vals = bytes(range(12))
        ac_vals = bytes(
            [0x00, 0xF0]
            + [(r << 4) | s for r in range(16) for s in range(1, 11)]
        )
        dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
        ac_bits = bytes([0] * 7 + [162] + [0] * 8)
        dc_codes = {sym: (4, i) for i, sym in enumerate(dc_vals)}
        ac_codes = {sym: (8, i) for i, sym in enumerate(ac_vals)}

        def _seg(marker: int, payload: bytes) -> bytes:
            return (
                bytes([0xFF, marker])
                + _struct.pack(">H", len(payload) + 2)
                + payload
            )

        class _BW:
            """MSB-first bit writer with 0xFF byte stuffing."""

            def __init__(self) -> None:
                self.buf = bytearray()
                self.acc = 0
                self.n = 0

            def put(self, val: int, nbits: int) -> None:
                if not nbits:
                    return
                self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
                self.n += nbits
                while self.n >= 8:
                    b = (self.acc >> (self.n - 8)) & 0xFF
                    self.n -= 8
                    self.buf.append(b)
                    if b == 0xFF:
                        self.buf.append(0x00)

            def flush(self) -> None:
                if self.n:
                    pad = 8 - self.n
                    b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
                    self.buf.append(b)
                    if b == 0xFF:
                        self.buf.append(0x00)
                    self.n = 0

        def _cat(v: int) -> int:
            return v.bit_length() if v >= 0 else (-v).bit_length()

        def _enc_block(bw: _BW, coefs: list[int], prev_dc: int) -> int:
            """Entropy-code one zigzag-ordered quantized block; returns
            its DC for the next block's prediction."""
            diff = coefs[0] - prev_dc
            s = _cat(diff)
            ln, c = dc_codes[s]
            bw.put(c, ln)
            if s:
                bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            last_nz = 0
            for k in range(63, 0, -1):
                if coefs[k]:
                    last_nz = k
                    break
            run = 0
            for k in range(1, last_nz + 1):
                v = coefs[k]
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    ln, c = ac_codes[0xF0]
                    bw.put(c, ln)
                    run -= 16
                s = _cat(v)
                ln, c = ac_codes[(run << 4) | s]
                bw.put(c, ln)
                bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                ln, c = ac_codes[0x00]
                bw.put(c, ln)
            return coefs[0]

        def _quantize(block: "_np.ndarray") -> list[int]:
            """Level-shift → DCT → uniform quantize → zigzag order."""
            coef = A @ (block.astype(_np.float64) - 128.0) @ A.T
            q = _np.rint(coef / Q).astype(_np.int64)
            return [int(q[i, j]) for i, j in zz]

        def _jpeg(doc_id: int) -> bytes:
            wb = 2 + doc_id % 3
            hb = 1 + doc_id % 2
            w, h = wb * 8, hb * 8
            head = b"\xff\xd8"  # SOI
            head += _seg(
                0xE0,
                b"JFIF\x00\x01\x01\x00" + _struct.pack(">HHBB", 1, 1, 0, 0),
            )
            qz = bytes([Q] * 64)  # uniform → zigzag order is identity
            head += _seg(0xDB, bytes([0x00]) + qz + bytes([0x01]) + qz)
            head += _seg(
                0xC0,
                _struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
            )
            head += _seg(
                0xC4,
                bytes([0x00]) + dc_bits + dc_vals
                + bytes([0x01]) + dc_bits + dc_vals
                + bytes([0x10]) + ac_bits + ac_vals
                + bytes([0x11]) + ac_bits + ac_vals,
            )
            head += _seg(
                0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
            )
            bw = _BW()
            prev = [0, 0, 0]  # DC prediction per component
            for by in range(hb):
                for bx in range(wb):
                    yv = (bx * 31 + by * 17 + doc_id * 7) % 256
                    if mode == "flat":
                        # constant blocks: DC = 8·(v-128)/Q = v-128
                        # exactly — no float DCT needed
                        blocks = [
                            [yv - 128] + [0] * 63,
                            [0] * 64,
                            [0] * 64,
                        ]
                    else:
                        yy, xx = _np.mgrid[0:8, 0:8]
                        ybl = (
                            (xx * 3 + yy * 5 + bx * 7 + by * 11 + doc_id)
                            % 256
                        ).astype(_np.float64)
                        # chroma stays near neutral (±32) so the RGB
                        # conversion exercises real color shifts
                        # without saturating whole channels to 0/255
                        cb = _np.full((8, 8), 96 + (bx * 13 + doc_id) % 64)
                        cr = _np.full((8, 8), 96 + (by * 19 + doc_id * 3) % 64)
                        blocks = [_quantize(b) for b in (ybl, cb, cr)]
                    for ci in range(3):
                        prev[ci] = _enc_block(bw, blocks[ci], prev[ci])
            bw.flush()
            return head + bytes(bw.buf) + b"\xff\xd9"

        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_jpeg(i) for i in ids],
                    "mime": ["image/jpeg"] * len(ids),
                }
            )

    return _nonneg_ids(docs, id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary, mime string"
    )


def jpeg_round_trip(docs: DataFrame) -> DataFrame:
    """documents → REAL baseline-JPEG bytes → REAL decode (Huffman +
    dequantize + IDCT + YCbCr→RGB). Output mirrors
    ``png_round_trip``; in ``flat`` mode every field is predictable
    from ``doc_id`` alone (constant blocks survive the uniform-8
    quantizer exactly, and neutral chroma makes R=G=B=Y), so the x87
    oracle proves the entropy-decode path end to end: one wrong
    Huffman code, zigzag slot, or IDCT term moves a channel mean."""
    return decode_media_features(synthesize_jpeg(docs)).select(
        "doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "decoded"
    )


def synthesize_mulaw(
    docs: DataFrame, id_col: str = "doc_id", law: str = "mu"
) -> DataFrame:
    """Deterministic REAL G.711 companded WAV bytes per document —
    μ-law (format tag 7, default) or A-law (``law='a'``, tag 6), not
    raw PCM: RIFF/WAVE with an 18-byte fmt chunk, the spec-required
    fact chunk, and a companded data chunk whose BYTES are arithmetic
    in ``doc_id`` — the decode expansion is pure integer arithmetic
    (CCITT G.711), so a SQL oracle can replay byte → 16-bit sample →
    rms/peak without any codec library (x88 replays the μ-law path;
    A-law is pytest-replayed). Map-only."""
    if law not in ("mu", "a"):
        raise ValueError(f"synthesize_mulaw: unknown law {law!r}")
    tag = 7 if law == "mu" else 6

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _wav(doc_id: int) -> bytes:
            n = 400 + doc_id % 100
            data = bytes((i * 7 + doc_id * 13) % 256 for i in range(n))
            sr = 8000
            fmt = _struct.pack("<HHIIHHH", tag, 1, sr, sr, 1, 8, 0)
            fact = _struct.pack("<I", n)
            body = (
                b"WAVE"
                + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                + b"fact" + _struct.pack("<I", len(fact)) + fact
                + b"data" + _struct.pack("<I", n) + data
                + (b"\x00" if n % 2 else b"")
            )
            return b"RIFF" + _struct.pack("<I", len(body)) + body

        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_wav(i) for i in ids],
                    "mime": ["audio/basic"] * len(ids),
                }
            )

    return _nonneg_ids(docs, id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary, mime string"
    )


def mulaw_round_trip(docs: DataFrame) -> DataFrame:
    """documents → REAL μ-law WAV bytes → REAL decode (G.711
    expansion to 16-bit PCM). rms/peak are rounded to 6 here because
    they pass through sqrt/div (sqrt is correctly rounded per IEEE so
    this is belt-and-braces); everything else is exact integer
    metadata. The x88 oracle replays the companding law in SQL."""
    return decode_media_features(synthesize_mulaw(docs)).select(
        "doc_id",
        "n_channels",
        "sample_rate",
        "n_samples",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
        "decoded",
    )


def synthesize_adpcm(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL IMA ADPCM WAV bytes per document (format tag
    17, 4-bit, mono): a pure-integer sawtooth PCM signal arithmetic in
    ``doc_id`` is run through the spec IMA encoder (quantize delta
    against the step table, update the shared predictor/step-index
    state machine), packed into 256-byte blocks with per-block headers
    plus the spec-required fact chunk. Closes the last codec-free WAV
    family next to PCM (stdlib wave) and G.711 (synthesize_mulaw) —
    only external-library codecs (MP3/AAC/opus) remain out of scope.
    Map-only; the encoder loop is per-payload over a bounded clip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        step_t = (
            7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
            19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
            50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
            130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
            337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
            876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
            2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
            5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
            13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
            29794, 32767,
        )
        index_t = (-1, -1, -1, -1, 2, 4, 6, 8)
        block_align = 256
        spb = (block_align - 4) * 2 + 1  # header sample + 2/byte

        def _enc_nibble(sample: int, pred: int, idx: int):
            step = step_t[idx]
            diff = sample - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # reconstruct exactly like the decoder so state never drifts
            delta = step >> 3
            if nib & 1:
                delta += step >> 2
            if nib & 2:
                delta += step >> 1
            if nib & 4:
                delta += step
            pred += -delta if nib & 8 else delta
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + index_t[nib & 7]))
            return nib, pred, idx

        def _wav(doc_id: int) -> bytes:
            n = 1200 + doc_id % 301
            a, b = 37 + doc_id % 11, doc_id * 13 % 4001
            pcm = [(((i * a + b) % 4001) - 2000) * 8 for i in range(n)]
            idx = 0
            blocks = []
            pos = 0
            while pos < n:
                chunk = pcm[pos : pos + spb]
                pred = chunk[0]
                blk = bytearray(_struct.pack("<hBB", pred, idx, 0))
                nibs = []
                for s in chunk[1:]:
                    nib, pred, idx = _enc_nibble(s, pred, idx)
                    nibs.append(nib)
                while len(nibs) < spb - 1:  # zero-pad the final block
                    nib, pred, idx = _enc_nibble(pred, pred, idx)
                    nibs.append(nib)
                for lo_n, hi_n in zip(nibs[0::2], nibs[1::2]):
                    blk.append(lo_n | (hi_n << 4))
                blocks.append(bytes(blk))
                pos += spb
            data = b"".join(blocks)
            sr = 8000
            fmt = _struct.pack(
                "<HHIIHHHH",
                17, 1, sr,
                sr * block_align // spb + 1,  # avg bytes/sec (advisory)
                block_align, 4, 2, spb,
            )
            fact = _struct.pack("<I", n)
            body = (
                b"WAVE"
                + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                + b"fact" + _struct.pack("<I", len(fact)) + fact
                + b"data" + _struct.pack("<I", len(data)) + data
                + (b"\x00" if len(data) % 2 else b"")
            )
            return b"RIFF" + _struct.pack("<I", len(body)) + body

        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [_wav(i) for i in ids],
                    "mime": ["audio/x-adpcm"] * len(ids),
                }
            )

    return _nonneg_ids(docs, id_col).mapInPandas(
        run, schema="doc_id bigint, payload binary, mime string"
    )


def adpcm_round_trip(docs: DataFrame) -> DataFrame:
    """documents → REAL IMA ADPCM WAV bytes → REAL decode (block-wise
    4-bit nibble expansion through the predictor/step-index state
    machine). n_samples/duration are exact integer metadata (the fact
    chunk truncates block padding); rms/peak are computed over the
    RECONSTRUCTED samples — ADPCM is lossy, so the pytest oracle
    compares them against an independent pure-Python decode of the
    same bytes (bit-exact) and against the source signal within the
    4-bit quantization tolerance."""
    return decode_media_features(synthesize_adpcm(docs)).select(
        "doc_id",
        "n_channels",
        "sample_rate",
        "n_samples",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
        "decoded",
    )


def gif_round_trip(docs: DataFrame) -> DataFrame:
    """documents → REAL GIF87a bytes → REAL decode (variable-width
    LZW expansion + palette mapping). Output: ``(doc_id, width,
    height, mean_r, mean_g, mean_b, decoded)`` — every field
    predictable from ``doc_id`` alone (the index field and the
    palette are both arithmetic, and channel sums of ≤ 8-bit values
    are exact in float64), so the x139 oracle proves the LZW
    decompression path end to end: one mis-synchronized code-width
    bump or a broken KwKwK branch moves a channel mean."""
    return decode_media_features(synthesize_gif(docs)).select(
        "doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "decoded"
    )


def png_round_trip(docs: DataFrame) -> DataFrame:
    """documents → REAL PNG bytes → REAL decode (inflate + unfilter).
    Output: ``(doc_id, width, height, mean_r, mean_g, mean_b,
    decoded)`` — every field predictable from ``doc_id`` alone (the
    pixel pattern is arithmetic and channel sums of ≤ 8-bit values
    are exact in float64), so the x85 oracle proves the decompression
    path end to end: one corrupted filter byte or inflate error moves
    a channel mean."""
    return decode_media_features(synthesize_png(docs)).select(
        "doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "decoded"
    )


def decode_media_features(media: DataFrame) -> DataFrame:
    """REAL decode + feature extraction for WAV/PPM/BMP/PNG payloads,
    sniffed by magic bytes (PNG is a genuinely COMPRESSED format:
    zlib inflate + scanline unfiltering, stdlib-only); anything else
    falls through with
    ``decoded=false`` (byte_len only). Audio features (rms/peak) are
    computed over the actual PCM samples normalized to [-1, 1]; image
    features over the actual pixel array. Arrow-batched, map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import functools as _functools
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        @_functools.lru_cache(maxsize=1)
        def _jpeg_consts():
            # zigzag order + orthonormal DCT basis: built once per
            # task, not per payload (the synthesize side hoists the
            # identical constants to its iterator scope)
            zz = sorted(
                ((i, j) for i in range(8) for j in range(8)),
                key=lambda t: (
                    t[0] + t[1],
                    t[0] if (t[0] + t[1]) % 2 else -t[0],
                ),
            )
            ax = _np.arange(8)
            A = (
                _np.cos((2 * ax[None, :] + 1) * ax[:, None] * _np.pi / 16)
                / 2.0
            )
            A[0, :] /= _np.sqrt(2.0)
            return zz, A

        def _null_row(doc_id: int, p: bytes) -> dict:
            return {
                "doc_id": doc_id,
                "kind": "unknown",
                "byte_len": len(p),
                "width": None,
                "height": None,
                "n_channels": None,
                "sample_rate": None,
                "n_samples": None,
                "duration_ms": None,
                "rms": None,
                "peak": None,
                "mean_r": None,
                "mean_g": None,
                "mean_b": None,
                "decoded": False,
            }

        def _parse_riff_mulaw(p: bytes):
            """G.711 companded WAV (format tag 7 = μ-law, tag 6 =
            A-law; 8-bit): RIFF chunk walk + the CCITT expansion —
            pure integer arithmetic, so the x88 SQL oracle replays
            the μ-law path. Returns (nch, sr, pcm int16 array) or
            None."""
            if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                return None
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(p):
                cid = p[pos : pos + 4]
                ln = int.from_bytes(p[pos + 4 : pos + 8], "little")
                body = p[pos + 8 : pos + 8 + ln]
                pos += 8 + ln + (ln & 1)
                if cid == b"fmt ":
                    fmt = body
                elif cid == b"data":
                    data = body
            if fmt is None or data is None or len(fmt) < 16:
                return None
            tag = int.from_bytes(fmt[0:2], "little")
            nch = int.from_bytes(fmt[2:4], "little")
            sr = int.from_bytes(fmt[4:8], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if tag not in (6, 7) or bits != 8 or nch < 1 or sr <= 0:
                return None
            u = _np.frombuffer(data, dtype=_np.uint8)
            if tag == 7:  # μ-law
                x = (~u).astype(_np.int64) & 0xFF
                t = (((x & 15) << 3) + 132) << ((x >> 4) & 7)
                pcm = _np.where(x & 0x80, 132 - t, t - 132)
            else:  # A-law
                x = (u.astype(_np.int64)) ^ 0x55
                seg = (x & 0x70) >> 4
                t = (x & 15) << 4
                t = _np.where(
                    seg == 0,
                    t + 8,
                    _np.where(
                        seg == 1,
                        t + 0x108,
                        (t + 0x108) << _np.maximum(seg - 1, 0),
                    ),
                )
                pcm = _np.where(x & 0x80, t, -t)
            return nch, sr, pcm

        # IMA ADPCM step-size table (spec constant, 89 entries) — local
        # to the closure like every other constant here, so the task
        # pickles by value and never needs csvb_spark on executors
        _IMA_STEP = (
            7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
            19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
            50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
            130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
            337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
            876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
            2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
            5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
            13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
            29794, 32767,
        )

        def _parse_riff_adpcm(p: bytes):
            """IMA/DVI ADPCM WAV (format tag 17, 4-bit): RIFF walk +
            the per-block nibble expansion (predictor/step-index state
            machine — IMA spec tables, pure integer arithmetic, no
            codec library). Mono blocks: 4-byte header (int16
            predictor, uint8 step index, pad) then 2 samples/byte, low
            nibble first. The fact chunk truncates the zero-padded
            final block to the true sample count. Inherently
            SEQUENTIAL (each sample feeds the next prediction), so the
            loop is per-payload Python — feature extraction over
            bounded clips, not a bulk-audio path; a 100 TB audio
            pipeline would decode with a real codec library on the
            same mapInPandas plumbing."""
            if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                return None
            pos, fmt, data, fact_n = 12, None, None, None
            while pos + 8 <= len(p):
                cid = p[pos : pos + 4]
                ln = int.from_bytes(p[pos + 4 : pos + 8], "little")
                body = p[pos + 8 : pos + 8 + ln]
                pos += 8 + ln + (ln & 1)
                if cid == b"fmt ":
                    fmt = body
                elif cid == b"data":
                    data = body
                elif cid == b"fact" and ln >= 4:
                    fact_n = int.from_bytes(body[:4], "little")
            if fmt is None or data is None or len(fmt) < 16:
                return None
            tag = int.from_bytes(fmt[0:2], "little")
            nch = int.from_bytes(fmt[2:4], "little")
            sr = int.from_bytes(fmt[4:8], "little")
            block_align = int.from_bytes(fmt[12:14], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if tag != 17 or bits != 4 or nch != 1 or block_align < 5:
                return None
            step_t = _IMA_STEP
            index_t = (-1, -1, -1, -1, 2, 4, 6, 8)
            out: list[int] = []
            for bstart in range(0, len(data) - 3, block_align):
                blk = data[bstart : bstart + block_align]
                pred = int.from_bytes(blk[0:2], "little", signed=True)
                idx = min(max(blk[2], 0), 88)
                out.append(pred)
                for byte in blk[4:]:
                    for nib in (byte & 15, byte >> 4):
                        step = step_t[idx]
                        delta = step >> 3
                        if nib & 1:
                            delta += step >> 2
                        if nib & 2:
                            delta += step >> 1
                        if nib & 4:
                            delta += step
                        pred += -delta if nib & 8 else delta
                        pred = max(-32768, min(32767, pred))
                        idx = max(0, min(88, idx + index_t[nib & 7]))
                        out.append(pred)
            if fact_n is not None:
                out = out[:fact_n]
            return nch, sr, _np.asarray(out, dtype=_np.int64)

        def _decode_wav(doc_id: int, p: bytes) -> dict:
            try:
                with _wave.open(_io.BytesIO(p), "rb") as w:
                    nch, sw, sr, n = (
                        w.getnchannels(),
                        w.getsampwidth(),
                        w.getframerate(),
                        w.getnframes(),
                    )
                    raw = w.readframes(n)
            except _wave.Error:
                # stdlib wave is PCM-only; companded formats (G.711
                # μ-law, tag 7) and IMA ADPCM (tag 17) decode via the
                # manual RIFF walks
                mu = _parse_riff_mulaw(p) or _parse_riff_adpcm(p)
                if mu is None:
                    return _null_row(doc_id, p)
                nch, sr, pcm = mu
                x = pcm.astype(_np.float64) / 32768.0
                n = len(pcm) // nch
                row = _null_row(doc_id, p)
                row.update(
                    kind="audio",
                    n_channels=nch,
                    sample_rate=sr,
                    n_samples=n,
                    duration_ms=round(n * 1000.0 / sr, 6),
                    rms=float(_np.sqrt(_np.mean(x * x))) if len(x) else 0.0,
                    peak=float(_np.max(_np.abs(x))) if len(x) else 0.0,
                    decoded=True,
                )
                return row
            if sw == 3:
                # 24-bit PCM: no numpy dtype — compose little-endian
                # triples and sign-extend (found by the pluck-pcm24
                # external golden; stdlib wave hands the raw bytes
                # through with sampwidth 3)
                b3 = (
                    _np.frombuffer(raw, dtype=_np.uint8)
                    .reshape(-1, 3)
                    .astype(_np.int64)
                )
                xi = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
                x = _np.where(xi >= 1 << 23, xi - (1 << 24), xi).astype(
                    _np.float64
                )
            else:
                dt = {1: _np.uint8, 2: _np.int16, 4: _np.int32}.get(sw)
                if dt is None:
                    return _null_row(doc_id, p)
                x = _np.frombuffer(raw, dtype=dt).astype(_np.float64)
                if sw == 1:
                    x = x - 128.0
            full = float(2 ** (8 * sw - 1))
            x = x / full
            row = _null_row(doc_id, p)
            row.update(
                kind="audio",
                n_channels=nch,
                sample_rate=sr,
                n_samples=n,
                duration_ms=round(n * 1000.0 / sr, 6),
                rms=float(_np.sqrt(_np.mean(x * x))) if len(x) else 0.0,
                peak=float(_np.max(_np.abs(x))) if len(x) else 0.0,
                decoded=True,
            )
            return row

        def _parse_ppm(p: bytes):
            # P6 header: magic, whitespace/comments, width, height,
            # maxval, single whitespace, then raw RGB
            pos, fields = 2, []
            while len(fields) < 3:
                while pos < len(p) and p[pos : pos + 1].isspace():
                    pos += 1
                if p[pos : pos + 1] == b"#":
                    while pos < len(p) and p[pos] != 0x0A:
                        pos += 1
                    continue
                start = pos
                while pos < len(p) and not p[pos : pos + 1].isspace():
                    pos += 1
                fields.append(int(p[start:pos]))
            pos += 1  # the single whitespace after maxval
            w, h, maxval = fields
            if maxval > 255:
                return None
            px = _np.frombuffer(p, dtype=_np.uint8, count=w * h * 3, offset=pos)
            return px.reshape(h, w, 3)

        def _parse_png(p: bytes):
            # 8-bit truecolor (color type 2) or truecolor+alpha
            # (color type 6, round 14 — what real-world tiny PNGs and
            # the published 1x1 goldens actually are), no interlace:
            # chunk walk, zlib inflate, then reverse the five scanline
            # filters (pixel-neighbor offsets are BYTES PER PIXEL, so
            # the same loops serve both layouts). Per-byte Python
            # loops for Sub/Average/Paeth are fine at the thumbnail
            # sizes this pipeline feeds (and Up/None are vectorized);
            # a production decoder would swap in a codec library
            # behind this same sniff.
            import zlib as _zlib

            if p[:8] != b"\x89PNG\r\n\x1a\n":
                return None
            pos, idat, w, h, bpp = 8, b"", None, None, 3
            while pos + 8 <= len(p):
                ln = int.from_bytes(p[pos : pos + 4], "big")
                typ = p[pos + 4 : pos + 8]
                data = p[pos + 8 : pos + 8 + ln]
                pos += 12 + ln
                if typ == b"IHDR":
                    w = int.from_bytes(data[0:4], "big")
                    h = int.from_bytes(data[4:8], "big")
                    bitd, ct, comp, filt, inter = data[8:13]
                    if bitd != 8 or ct not in (2, 6) or comp or filt or inter:
                        return None
                    bpp = 3 if ct == 2 else 4
                elif typ == b"IDAT":
                    idat += data
                elif typ == b"IEND":
                    break
            if not w or not h or not idat:
                return None
            raw = _zlib.decompress(idat)
            stride = w * bpp
            if len(raw) != h * (stride + 1):
                return None
            out = _np.zeros((h, stride), dtype=_np.uint8)
            rp = 0
            for y in range(h):
                f = raw[rp]
                cur = _np.frombuffer(
                    raw, dtype=_np.uint8, count=stride, offset=rp + 1
                ).astype(_np.int64)
                rp += 1 + stride
                prev = out[y - 1].astype(_np.int64) if y else _np.zeros(
                    stride, dtype=_np.int64
                )
                if f == 0:
                    pass
                elif f == 1:  # Sub
                    for i in range(bpp, stride):
                        cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
                elif f == 2:  # Up
                    cur = (cur + prev) & 0xFF
                elif f == 3:  # Average
                    for i in range(stride):
                        left = cur[i - bpp] if i >= bpp else 0
                        cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
                elif f == 4:  # Paeth
                    for i in range(stride):
                        a = cur[i - bpp] if i >= bpp else 0
                        b = prev[i]
                        c = prev[i - bpp] if i >= bpp else 0
                        pp = a + b - c
                        pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                        pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        cur[i] = (cur[i] + pr) & 0xFF
                else:
                    return None
                out[y] = cur.astype(_np.uint8)
            return out.reshape(h, w, bpp)

        def _parse_gif(p: bytes):
            # GIF87a/89a, global palette, single non-interlaced image
            # (what synthesize_gif emits): LSD + GCT walk, 89a
            # extension-block skip, then the REAL variable-width LZW
            # expansion — 9→12-bit codes read LSB-first, CLEAR/EOI
            # handling, the KwKwK self-reference case, and the
            # code-width bump in lockstep with the encoder (width
            # grows exactly when the next assignable code value no
            # longer fits — see synthesize_gif._lzw). Local palettes
            # and interlace return None (→ decoded=false), like every
            # other sniff here.
            if p[:6] not in (b"GIF87a", b"GIF89a"):
                return None
            if len(p) < 13:
                return None
            packed = p[10]
            if not packed & 0x80:
                return None  # no global palette
            gct_n = 2 << (packed & 0x07)
            pos = 13
            palette = _np.frombuffer(
                p, dtype=_np.uint8, count=gct_n * 3, offset=pos
            ).reshape(gct_n, 3)
            pos += gct_n * 3
            while pos < len(p) and p[pos] == 0x21:  # 89a extensions
                pos += 2  # introducer + label
                while pos < len(p) and p[pos]:
                    pos += 1 + p[pos]
                pos += 1  # block terminator
            if pos >= len(p) or p[pos] != 0x2C:
                return None
            w = int.from_bytes(p[pos + 5 : pos + 7], "little")
            h = int.from_bytes(p[pos + 7 : pos + 9], "little")
            idesc = p[pos + 9]
            if idesc & 0xC0:  # local palette or interlace
                return None
            pos += 10
            mcs = p[pos]
            pos += 1
            data = bytearray()
            while pos < len(p) and p[pos]:
                n = p[pos]
                data += p[pos + 1 : pos + 1 + n]
                pos += 1 + n
            clear, eoi = 1 << mcs, (1 << mcs) + 1
            singles = [bytes([i]) for i in range(clear)]
            table = singles + [b"", b""]
            cs = mcs + 1
            acc = nbits = dpos = 0
            prev = None
            out = bytearray()
            while True:
                while nbits < cs:
                    if dpos >= len(data):
                        # out of bits before EOI: real-world streams
                        # (the classic 42-byte spacer GIF, round-13
                        # golden) omit the EOI code and every browser
                        # tolerates it — stop here and let the exact
                        # w*h length check below decide validity
                        # instead of rejecting as truncation
                        nbits = -1
                        break
                    acc |= data[dpos] << nbits
                    nbits += 8
                    dpos += 1
                if nbits < 0:
                    break
                code = acc & ((1 << cs) - 1)
                acc >>= cs
                nbits -= cs
                if code == clear:
                    table = singles + [b"", b""]
                    cs = mcs + 1
                    prev = None
                    continue
                if code == eoi:
                    break
                if prev is None:
                    if code >= len(table):
                        return None
                    entry = table[code]
                else:
                    if code < len(table):
                        entry = table[code]
                    elif code == len(table):
                        entry = prev + prev[:1]  # KwKwK
                    else:
                        return None
                    if len(table) < 4096:
                        table.append(prev + entry[:1])
                        if len(table) == (1 << cs) and cs < 12:
                            cs += 1
                out += entry
                prev = entry
            if len(out) != w * h:
                return None
            idx = _np.frombuffer(bytes(out), dtype=_np.uint8)
            if int(idx.max(initial=0)) >= gct_n:
                return None
            return palette[idx].reshape(h, w, 3)

        def _parse_jpeg(p: bytes):
            # Baseline sequential JFIF, 8-bit, 1 (grayscale) or 3
            # (YCbCr) components, sampling factors 1-4 with the usual
            # divisibility rule — i.e. 4:4:4, 4:2:0, 4:2:2, 4:4:0 and
            # grayscale all decode (round 15: the external golden
            # python.jpg from CPython's own test suite is 2x2-
            # subsampled and IPython's 2x2.jpg is grayscale — both
            # were rejected by the earlier 3-component/1x1-only walk).
            # Segment walk, DQT/DHT table build (canonical codes
            # derived from the DHT bits array, nothing assumed),
            # interleaved-MCU entropy decode with DC prediction and
            # run-length AC, dequantize, IDCT, per-component
            # replication upsample, YCbCr→RGB. Progressive (SOF2) or
            # restart-interval streams return None (→ decoded=false),
            # like every other sniff here.
            if p[:2] != b"\xff\xd8":
                return None
            zz, A = _jpeg_consts()
            qt: dict[int, list[int]] = {}
            huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
            w = h = None
            # (component id, quant id, h-sampling, v-sampling)
            comps: list[tuple[int, int, int, int]] = []
            scomp: list[tuple[int, int, int]] = []  # (id, dc tbl, ac tbl)
            data = None
            pos = 2
            while pos + 4 <= len(p):
                if p[pos] != 0xFF:
                    return None
                m = p[pos + 1]
                if m == 0xD9:
                    break
                ln = int.from_bytes(p[pos + 2 : pos + 4], "big")
                seg = p[pos + 4 : pos + 2 + ln]
                pos += 2 + ln
                if m == 0xDB:
                    i = 0
                    while i < len(seg):
                        pq, tq = seg[i] >> 4, seg[i] & 15
                        if pq != 0 or i + 65 > len(seg):
                            return None
                        tbl = [0] * 64
                        for k in range(64):
                            ii, jj = zz[k]
                            tbl[ii * 8 + jj] = seg[i + 1 + k]
                        qt[tq] = tbl
                        i += 65
                elif m == 0xC0:
                    if seg[0] != 8 or seg[5] not in (1, 3):
                        return None
                    h = int.from_bytes(seg[1:3], "big")
                    w = int.from_bytes(seg[3:5], "big")
                    for c in range(seg[5]):
                        cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                        hi, vi = samp >> 4, samp & 15
                        if not (1 <= hi <= 4 and 1 <= vi <= 4):
                            return None
                        comps.append((cid, tq, hi, vi))
                elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xDD):
                    return None  # non-baseline / restart intervals
                elif m == 0xC4:
                    i = 0
                    while i + 17 <= len(seg):
                        tc, th = seg[i] >> 4, seg[i] & 15
                        bits = seg[i + 1 : i + 17]
                        nsym = sum(bits)
                        vals = seg[i + 17 : i + 17 + nsym]
                        code, vi = 0, 0
                        table: dict[tuple[int, int], int] = {}
                        for length in range(1, 17):
                            for _ in range(bits[length - 1]):
                                table[(length, code)] = vals[vi]
                                vi += 1
                                code += 1
                            code <<= 1
                        huff[(tc, th)] = table
                        i += 17 + nsym
                elif m == 0xDA:
                    if seg[0] != len(comps):
                        return None
                    for c in range(seg[0]):
                        cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                        scomp.append((cid, tt >> 4, tt & 15))
                    data = p[pos:]
                    break
                # APPn / COM: skip
            if data is None or w is None or not comps:
                return None
            # unstuff the entropy stream up to EOI
            es = bytearray()
            i = 0
            while i < len(data):
                b = data[i]
                if b == 0xFF:
                    nxt = data[i + 1] if i + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        es.append(0xFF)
                        i += 2
                        continue
                    if nxt == 0xD9:
                        break
                    return None  # RSTn or stray marker: unsupported
                es.append(b)
                i += 1

            bitpos = 0
            nbits = len(es) * 8

            def _rd(n: int) -> int | None:
                nonlocal bitpos
                if bitpos + n > nbits:
                    return None
                v = 0
                for _ in range(n):
                    v = (v << 1) | (
                        (es[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
                    )
                    bitpos += 1
                return v

            def _sym(table) -> int | None:
                code = 0
                for length in range(1, 17):
                    b = _rd(1)
                    if b is None:
                        return None
                    code = (code << 1) | b
                    if (length, code) in table:
                        return table[(length, code)]
                return None

            def _ext(v: int, s: int) -> int:
                return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

            if len(scomp) == 1:
                # non-interleaved single-component scan: sampling
                # factors do not apply to the scan layout (T.81
                # A.2.2) — one block per MCU over the component's own
                # full-resolution grid
                cid0, tq0, _hi, _vi = comps[0]
                comps = [(cid0, tq0, 1, 1)]
            hmax = max(hi for _c, _t, hi, _v in comps)
            vmax = max(vi for _c, _t, _h2, vi in comps)
            if any(hmax % hi or vmax % vi for _c, _t, hi, vi in comps):
                return None
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            planes = [
                _np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=_np.float64)
                for _c, _t, hi, vi in comps
            ]
            prev = [0] * len(comps)
            by_id = {cid: k for k, (cid, _tq, _hi, _vi) in enumerate(comps)}

            def _block(ci: int, dcid: int, acid: int):
                q = qt.get(comps[ci][1])
                dct = huff.get((0, dcid))
                act = huff.get((1, acid))
                if q is None or dct is None or act is None:
                    return None
                coef = _np.zeros((8, 8), dtype=_np.float64)
                s = _sym(dct)
                if s is None or s > 11:
                    return None
                diff = 0
                if s:
                    v = _rd(s)
                    if v is None:
                        return None
                    diff = _ext(v, s)
                prev[ci] += diff
                coef[0, 0] = prev[ci] * q[0]
                k = 1
                while k < 64:
                    sym = _sym(act)
                    if sym is None:
                        return None
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 15
                    if size == 0:
                        if run != 15:
                            return None
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        return None
                    v = _rd(size)
                    if v is None:
                        return None
                    ii, jj = zz[k]
                    coef[ii, jj] = _ext(v, size) * q[ii * 8 + jj]
                    k += 1
                return A.T @ coef @ A + 128.0

            for my in range(mcuy):
                for mx in range(mcux):
                    for cid, dcid, acid in scomp:
                        ci = by_id.get(cid)
                        if ci is None:
                            return None
                        _cid, _tq, hi, vi = comps[ci]
                        for byy in range(vi):
                            for bxx in range(hi):
                                block = _block(ci, dcid, acid)
                                if block is None:
                                    return None
                                r0 = (my * vi + byy) * 8
                                c0 = (mx * hi + bxx) * 8
                                planes[ci][
                                    r0 : r0 + 8, c0 : c0 + 8
                                ] = block
            # replication upsample each plane to full resolution, crop
            full = []
            for k2, (_cid, _tq, hi, vi) in enumerate(comps):
                pl = planes[k2]
                if hi != hmax or vi != vmax:
                    pl = pl.repeat(vmax // vi, axis=0).repeat(
                        hmax // hi, axis=1
                    )
                full.append(pl[:h, :w])
            if len(full) == 1:  # grayscale: R = G = B = Y
                y = full[0]
                rgb = _np.stack([y, y, y], axis=-1)
            else:
                y = full[0]
                cb = full[1] - 128.0
                cr = full[2] - 128.0
                r = y + 1.402 * cr
                g = y - 0.344136 * cb - 0.714136 * cr
                b = y + 1.772 * cb
                rgb = _np.stack([r, g, b], axis=-1)
            return _np.clip(_np.rint(rgb), 0, 255).astype(_np.uint8)

        def _parse_bmp(p: bytes):
            # 24-bit uncompressed BI_RGB only; rows 4-byte padded,
            # bottom-up (positive height)
            if len(p) < 54:
                return None
            off = int.from_bytes(p[10:14], "little")
            w = int.from_bytes(p[18:22], "little", signed=True)
            h = int.from_bytes(p[22:26], "little", signed=True)
            bpp = int.from_bytes(p[28:30], "little")
            comp = int.from_bytes(p[30:34], "little")
            if bpp != 24 or comp != 0 or w <= 0 or h <= 0:
                return None
            stride = (w * 3 + 3) & ~3
            rows = _np.frombuffer(
                p, dtype=_np.uint8, count=stride * h, offset=off
            ).reshape(h, stride)[:, : w * 3]
            bgr = rows.reshape(h, w, 3)[::-1]  # bottom-up → top-down
            return bgr[..., ::-1]  # BGR → RGB

        def _decode_image(doc_id: int, p: bytes, px) -> dict:
            # px is (h, w, 3) RGB or (h, w, 4) RGBA (PNG color type 6,
            # round 14) — mean_r/g/b always read the color channels,
            # n_channels reports the true layout
            h, w, nch = px.shape[0], px.shape[1], px.shape[2]
            means = px.reshape(-1, nch).mean(axis=0)
            row = _null_row(doc_id, p)
            row.update(
                kind="image",
                width=w,
                height=h,
                n_channels=nch,
                mean_r=round(float(means[0]), 6),
                mean_g=round(float(means[1]), 6),
                mean_b=round(float(means[2]), 6),
                decoded=True,
            )
            return row

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                doc_id, p = int(doc_id), bytes(p)
                try:
                    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        rows.append(_decode_wav(doc_id, p))
                    elif p[:2] == b"P6":
                        px = _parse_ppm(p)
                        rows.append(
                            _decode_image(doc_id, p, px)
                            if px is not None
                            else _null_row(doc_id, p)
                        )
                    elif p[:2] == b"BM":
                        px = _parse_bmp(p)
                        rows.append(
                            _decode_image(doc_id, p, px)
                            if px is not None
                            else _null_row(doc_id, p)
                        )
                    elif p[:8] == b"\x89PNG\r\n\x1a\n":
                        px = _parse_png(p)
                        rows.append(
                            _decode_image(doc_id, p, px)
                            if px is not None
                            else _null_row(doc_id, p)
                        )
                    elif p[:6] in (b"GIF87a", b"GIF89a"):
                        px = _parse_gif(p)
                        rows.append(
                            _decode_image(doc_id, p, px)
                            if px is not None
                            else _null_row(doc_id, p)
                        )
                    elif p[:2] == b"\xff\xd8":
                        px = _parse_jpeg(p)
                        rows.append(
                            _decode_image(doc_id, p, px)
                            if px is not None
                            else _null_row(doc_id, p)
                        )
                    else:
                        rows.append(_null_row(doc_id, p))
                except Exception:
                    rows.append(_null_row(doc_id, p))
            yield _pd.DataFrame(rows)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def real_multimodal_pipeline(docs: DataFrame) -> DataFrame:
    """documents → REAL synthesized WAV/PPM bytes → REAL decode.
    Every metadata field the decode reports is arithmetic in doc_id
    (see synthesize_media), so a SQL oracle can verify the full
    encode→decode round trip without touching a byte itself."""
    return decode_media_features(synthesize_media(docs)).select(
        "doc_id",
        "kind",
        "byte_len",
        "width",
        "height",
        "n_channels",
        "sample_rate",
        "n_samples",
        "duration_ms",
        "decoded",
    )


RESIZED_REAL_SCHEMA = (
    "doc_id bigint, payload binary, kind string, width int, height int, "
    "sample_rate int, transformed boolean"
)


def transform_media(
    media: DataFrame,
    width: int = 16,
    height: int = 16,
    target_rate: int = 4000,
) -> DataFrame:
    """REAL media transforms for the codec-free formats: PPM(P6)
    images are nearest-neighbor resampled to ``width×height`` and
    re-encoded as P6; WAV/PCM audio is integer-factor decimated to
    ≤ ``target_rate`` and re-encoded as WAV. Payloads the decoders
    can't parse pass through unchanged with ``transformed=false`` —
    the honest analogue of the byte-budget stub in :func:`resize`.

    Nearest-neighbor / take-every-kth are the transforms NumPy can do
    exactly without codec or filtering libraries; at production scale
    the same mapInPandas slot holds a real resampler. Map-only, 1 row
    in → 1 row out, zero shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        def _parse_ppm(p: bytes):
            pos, fields = 2, []
            while len(fields) < 3:
                while pos < len(p) and p[pos : pos + 1].isspace():
                    pos += 1
                if p[pos : pos + 1] == b"#":
                    while pos < len(p) and p[pos] != 0x0A:
                        pos += 1
                    continue
                start = pos
                while pos < len(p) and not p[pos : pos + 1].isspace():
                    pos += 1
                fields.append(int(p[start:pos]))
            pos += 1
            w, h, maxval = fields
            if maxval > 255:
                return None
            px = _np.frombuffer(p, dtype=_np.uint8, count=w * h * 3, offset=pos)
            return px.reshape(h, w, 3)

        def _resize_ppm(p: bytes):
            px = _parse_ppm(p)
            h0, w0 = px.shape[0], px.shape[1]
            # nearest-neighbor index maps (the standard floor((i+.5)*scale))
            ys = _np.minimum(
                ((_np.arange(height) + 0.5) * h0 / height).astype(_np.int64), h0 - 1
            )
            xs = _np.minimum(
                ((_np.arange(width) + 0.5) * w0 / width).astype(_np.int64), w0 - 1
            )
            out = px[ys[:, None], xs[None, :]]
            return (
                f"P6\n{width} {height}\n255\n".encode() + out.tobytes(),
                width,
                height,
                None,
            )

        def _decimate_wav(p: bytes):
            with _wave.open(_io.BytesIO(p), "rb") as w:
                nch, sw, sr, n = (
                    w.getnchannels(),
                    w.getsampwidth(),
                    w.getframerate(),
                    w.getnframes(),
                )
                raw = w.readframes(n)
            if sw != 2:
                return None
            # ceil division: the decimated rate must be <= target_rate
            factor = max(1, -(-sr // target_rate))
            x = _np.frombuffer(raw, dtype=_np.int16).reshape(-1, nch)
            y = x[::factor]
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(nch)
                w.setsampwidth(2)
                w.setframerate(sr // factor)
                w.writeframes(y.tobytes())
            return buf.getvalue(), None, None, sr // factor

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                doc_id, p = int(doc_id), bytes(p)
                got = None
                kind = "unknown"
                try:
                    if p[:2] == b"P6":
                        kind, got = "image", _resize_ppm(p)
                    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                        kind, got = "audio", _decimate_wav(p)
                except Exception:
                    got = None
                if got is None:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "payload": p,
                            "kind": kind,
                            "width": None,
                            "height": None,
                            "sample_rate": None,
                            "transformed": False,
                        }
                    )
                else:
                    payload, w_, h_, sr_ = got
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "payload": payload,
                            "kind": kind,
                            "width": w_,
                            "height": h_,
                            "sample_rate": sr_,
                            "transformed": True,
                        }
                    )
            yield _pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=RESIZED_REAL_SCHEMA
    )
