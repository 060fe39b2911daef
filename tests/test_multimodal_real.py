"""REAL multimodal decode: WAV/PPM/BMP parsers verified against
independently-constructed files and NumPy-computed signal features.
The metadata round trip vs DuckDB is x66 in test_oracle.py."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from csvb_spark.operators.multimodal import (
    decode_media_features,
    real_multimodal_pipeline,
    synthesize_media,
)


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, payload binary")


def _make_wav(samples: np.ndarray, sr: int = 8000, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def _make_bmp(px_rgb: np.ndarray) -> bytes:
    """Hand-assemble a 24-bit BI_RGB BMP (bottom-up, 4-byte padded
    rows) — independent of the decoder under test."""
    h, w, _ = px_rgb.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in px_rgb[::-1]:  # bottom-up
        line = row[:, ::-1].tobytes()  # RGB → BGR
        body += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    size = off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return bytes(header + info + body)


def test_wav_decode_features_match_numpy(spark):
    rng = np.random.default_rng(7)
    samples = rng.integers(-20000, 20000, size=1234).astype(np.int16)
    wav = _make_wav(samples, sr=16000)
    out = decode_media_features(_media_df(spark, [(1, wav)])).collect()[0]
    x = samples.astype(np.float64) / 32768.0
    assert out["kind"] == "audio" and out["decoded"]
    assert out["sample_rate"] == 16000
    assert out["n_samples"] == 1234
    assert out["n_channels"] == 1
    assert out["duration_ms"] == pytest.approx(1234 * 1000.0 / 16000, abs=1e-6)
    assert out["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))), rel=1e-12)
    assert out["peak"] == pytest.approx(float(np.max(np.abs(x))), rel=1e-12)


def test_ppm_decode_with_comments_and_means(spark):
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    out = decode_media_features(_media_df(spark, [(1, payload)])).collect()[0]
    assert out["kind"] == "image" and out["decoded"]
    assert (out["width"], out["height"], out["n_channels"]) == (3, 2, 3)
    means = px.reshape(-1, 3).mean(axis=0)
    assert out["mean_r"] == pytest.approx(round(float(means[0]), 6))
    assert out["mean_b"] == pytest.approx(round(float(means[2]), 6))


def test_bmp_decode_recovers_pixels_means(spark):
    # 3×2 with distinct channel values; odd width forces row padding
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[..., 0] = 200  # R
    px[..., 1] = 100  # G
    px[0, 0] = (1, 2, 3)
    out = decode_media_features(_media_df(spark, [(9, _make_bmp(px))])).collect()[0]
    assert out["kind"] == "image" and out["decoded"]
    assert (out["width"], out["height"]) == (3, 2)
    means = px.reshape(-1, 3).mean(axis=0)
    assert out["mean_r"] == pytest.approx(round(float(means[0]), 6))
    assert out["mean_g"] == pytest.approx(round(float(means[1]), 6))
    assert out["mean_b"] == pytest.approx(round(float(means[2]), 6))


def test_unknown_and_corrupt_payloads_fall_through(spark):
    rows = [
        (1, b"\xff\xd8\xff\xe0 JPEG-ish"),  # compressed format: no codec
        (2, b"P6\n4 4\n255\n" + b"\x01" * 5),  # truncated pixel data
        (3, b"RIFFxxxxWAVEjunk"),  # WAV magic, unparseable body
    ]
    out = {
        r["doc_id"]: r for r in decode_media_features(_media_df(spark, rows)).collect()
    }
    assert not out[1]["decoded"] and out[1]["kind"] == "unknown"
    assert out[1]["byte_len"] == len(rows[0][1])
    assert not out[3]["decoded"]
    # truncated PPM: frombuffer raises → clean fallback, no crash
    assert not out[2]["decoded"]


def test_synthesized_payloads_open_with_external_readers(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
    rows = synthesize_media(docs).collect()
    for r in rows:
        p = bytes(r["payload"])
        if r["doc_id"] % 2 == 0:
            with wave.open(io.BytesIO(p), "rb") as w:  # stdlib reader
                assert w.getframerate() == 8000
                assert w.getnframes() == 800 + (r["doc_id"] % 17) * 40
        else:
            assert p.startswith(b"P6\n")
            w_, h_ = 8 + r["doc_id"] % 9, 6 + r["doc_id"] % 7
            assert len(p) == len(f"P6\n{w_} {h_}\n255\n") + 3 * w_ * h_


def test_real_pipeline_stereo_and_plan_shape(spark, sf_dir):
    # stereo + 8-bit sample width exercise the non-default branches
    stereo = np.tile(np.array([1000, -1000], dtype=np.int16), 50)
    wav = _make_wav(stereo, sr=4000, nch=2)
    out = decode_media_features(_media_df(spark, [(4, wav)])).collect()[0]
    assert out["n_channels"] == 2 and out["n_samples"] == 50
    # map-only contract: the full pipeline has no shuffle
    df = real_multimodal_pipeline(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)  # noqa: SLF001
    assert "Exchange" not in plan


def test_transform_media_nn_resize_exact(spark):
    from csvb_spark.operators.multimodal import transform_media

    # 4×4 checkerboard-ish: NN to 2×2 must pick pixels (1,1),(1,3),(3,1),(3,3)
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    payload = b"P6\n4 4\n255\n" + px.tobytes()
    out = transform_media(
        _media_df(spark, [(1, payload)]), width=2, height=2
    ).collect()[0]
    assert out["transformed"] and (out["width"], out["height"]) == (2, 2)
    got = np.frombuffer(bytes(out["payload"])[len(b"P6\n2 2\n255\n"):], dtype=np.uint8)
    want = px[np.ix_([1, 3], [1, 3])].reshape(-1)
    assert np.array_equal(got, want)


def test_transform_media_wav_decimation_roundtrip(spark):
    from csvb_spark.operators.multimodal import decode_media_features, transform_media

    samples = np.arange(800, dtype=np.int16)
    wav = _make_wav(samples, sr=8000)
    out = transform_media(
        _media_df(spark, [(2, wav)]), target_rate=2000
    ).collect()[0]
    assert out["transformed"] and out["sample_rate"] == 2000
    # re-decode the transformed payload: every 4th sample survives
    dec = decode_media_features(
        _media_df(spark, [(2, bytes(out["payload"]))])
    ).collect()[0]
    assert dec["decoded"] and dec["sample_rate"] == 2000
    assert dec["n_samples"] == 200
    with wave.open(io.BytesIO(bytes(out["payload"])), "rb") as w:
        got = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    assert np.array_equal(got, samples[::4])


def test_transform_media_passthrough_unknown(spark):
    from csvb_spark.operators.multimodal import transform_media

    out = transform_media(_media_df(spark, [(3, b"\x89PNG unparseable")])).collect()[0]
    assert not out["transformed"]
    assert bytes(out["payload"]) == b"\x89PNG unparseable"


def test_transform_media_decimation_never_exceeds_target_rate(spark):
    from csvb_spark.operators.multimodal import transform_media

    # sr in (target, 2*target): floor division would leave it at sr
    wav = _make_wav(np.arange(400, dtype=np.int16), sr=8000)
    out = transform_media(
        _media_df(spark, [(1, wav)]), target_rate=3000
    ).collect()[0]
    assert out["transformed"] and out["sample_rate"] <= 3000


# --- round 6: REAL PNG (compressed) decode -----------------------------
def test_png_round_trip_pixels_exact(spark):
    """The decoded PNG pixels equal the synthesized pattern exactly —
    the zlib inflate + all-filter unfilter path is lossless."""
    from csvb_spark.operators.multimodal import png_round_trip

    docs = spark.createDataFrame(
        [(i,) for i in range(25)], "doc_id bigint"
    )
    got = {r["doc_id"]: r for r in png_round_trip(docs).collect()}
    assert len(got) == 25
    import numpy as np

    for d, r in got.items():
        w, h = 5 + d % 7, 4 + d % 5
        assert (r["width"], r["height"], r["decoded"]) == (w, h, True)
        y, x = np.mgrid[0:h, 0:w]
        assert r["mean_r"] == round(float(((x * 5 + d) % 256).mean()), 6)
        assert r["mean_g"] == round(float(((y * 11 + d) % 256).mean()), 6)
        assert r["mean_b"] == round(float(((x * y + d) % 256).mean()), 6)


def test_png_decoder_handles_all_filters_and_corruption(spark):
    """A PNG carrying Average and Paeth filtered rows decodes exactly;
    a corrupted IDAT falls through decoded=false instead of raising."""
    import struct
    import zlib

    import numpy as np

    from csvb_spark.operators.multimodal import decode_media_features

    def chunk(typ, data):
        return (
            struct.pack("!I", len(data))
            + typ
            + data
            + struct.pack("!I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    # encode a known 4x3 image using filters 3 (Average) and 4 (Paeth)
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(3, 4, 3)).astype(np.uint8)
    stride = 4 * 3
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(3):
        line = px[y].reshape(-1).astype(np.int64)
        f = 3 if y % 2 else 4
        filt = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) % 256
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack("!IIBBBBB", 4, 3, 8, 2, 0, 0, 0)
    good = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    bad = good[:50] + bytes([good[50] ^ 0xFF]) + good[51:]  # corrupt IDAT

    media = spark.createDataFrame(
        [(1, bytearray(good), "image/png"), (2, bytearray(bad), "image/png")],
        "doc_id bigint, payload binary, mime string",
    )
    rows = {r["doc_id"]: r for r in decode_media_features(media).collect()}
    assert rows[1]["decoded"] is True
    means = px.reshape(-1, 3).mean(axis=0)
    assert rows[1]["mean_r"] == round(float(means[0]), 6)
    assert rows[1]["mean_g"] == round(float(means[1]), 6)
    assert rows[1]["mean_b"] == round(float(means[2]), 6)
    assert rows[2]["decoded"] is False  # corruption is contained


# --- round 7: baseline JPEG, the full entropy-coded codec --------------------
def _jpeg_ref_decode_gradient(doc_id: int):
    """Independent replay of the gradient-mode encode→decode
    arithmetic (float DCT → uniform-8 quantize → dequantize → IDCT →
    clamp → YCbCr→RGB), sharing no code with the operator module —
    only the published JPEG math."""
    import numpy as np

    ax = np.arange(8)
    A = np.cos((2 * ax[None, :] + 1) * ax[:, None] * np.pi / 16) / 2.0
    A[0, :] /= np.sqrt(2.0)
    wb, hb = 2 + doc_id % 3, 1 + doc_id % 2
    planes = [np.zeros((hb * 8, wb * 8)) for _ in range(3)]
    for by in range(hb):
        for bx in range(wb):
            yy, xx = np.mgrid[0:8, 0:8]
            blocks = [
                ((xx * 3 + yy * 5 + bx * 7 + by * 11 + doc_id) % 256).astype(
                    float
                ),
                np.full((8, 8), 96 + (bx * 13 + doc_id) % 64, dtype=float),
                np.full((8, 8), 96 + (by * 19 + doc_id * 3) % 64, dtype=float),
            ]
            for ci, bl in enumerate(blocks):
                coef = A @ (bl - 128.0) @ A.T
                deq = np.rint(coef / 8.0) * 8.0
                rec = A.T @ deq @ A + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rec
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def test_jpeg_flat_round_trip_exact(spark):
    """Constant 8x8 blocks survive the uniform-8 quantizer exactly,
    so the decoded means equal the doc_id arithmetic bit-for-bit —
    the lossless corner of a lossy codec (the x87 oracle's basis)."""
    from csvb_spark.operators.multimodal import jpeg_round_trip

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id bigint")
    for r in jpeg_round_trip(docs).collect():
        wb, hb = 2 + r.doc_id % 3, 1 + r.doc_id % 2
        exp = round(
            sum(
                (bx * 31 + by * 17 + r.doc_id * 7) % 256
                for bx in range(wb)
                for by in range(hb)
            )
            / (wb * hb),
            6,
        )
        assert r.decoded and (r.width, r.height) == (wb * 8, hb * 8)
        assert r.mean_r == r.mean_g == r.mean_b == exp


def test_jpeg_gradient_mode_matches_reference_replay(spark):
    """Gradient blocks carry real AC coefficients: zigzag, run-length
    coding, DC prediction, and the chroma path must all be right for
    the decoded means to match the independent quantize→IDCT replay."""
    from csvb_spark.operators.multimodal import (
        decode_media_features,
        synthesize_jpeg,
    )

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    got = {
        r.doc_id: r
        for r in decode_media_features(
            synthesize_jpeg(docs, mode="gradient")
        ).collect()
    }
    for i in range(8):
        ref = _jpeg_ref_decode_gradient(i)
        means = ref.reshape(-1, 3).mean(axis=0)
        r = got[i]
        assert r.decoded and (r.height, r.width) == ref.shape[:2]
        assert (r.mean_r, r.mean_g, r.mean_b) == tuple(
            round(float(m), 6) for m in means
        )


def test_jpeg_corrupt_and_unsupported_fall_through(spark):
    """A truncated entropy stream and a progressive (SOF2) stream both
    fall through decoded=false instead of raising."""
    from csvb_spark.operators.multimodal import (
        decode_media_features,
        synthesize_jpeg,
    )

    docs = spark.createDataFrame([(1,)], "doc_id bigint")
    good = bytes(
        synthesize_jpeg(docs).collect()[0].payload
    )
    truncated = good[: len(good) // 2]
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    out = {
        r.doc_id: r.decoded
        for r in decode_media_features(
            _media_df(
                spark,
                [(1, bytearray(truncated)), (2, bytearray(progressive))],
            )
        ).collect()
    }
    assert out == {1: False, 2: False}


def test_jpeg_huffman_tables_are_honored_not_assumed(spark):
    """The decoder derives codes from the DHT bits array rather than
    assuming the encoder's table: shuffling the DHT value order (a
    DIFFERENT valid canonical table) must change decode results, so
    corrupt the first DC value slot and expect a clean fall-through
    or a different mean — never the original answer with a raise."""
    from csvb_spark.operators.multimodal import (
        decode_media_features,
        synthesize_jpeg,
    )

    docs = spark.createDataFrame([(3,)], "doc_id bigint")
    good = bytes(synthesize_jpeg(docs).collect()[0].payload)
    base = decode_media_features(
        _media_df(spark, [(3, bytearray(good))])
    ).collect()[0]
    assert base.decoded
    # swap DC symbols 4 and 5 in the luma DHT (categories this
    # image's luma DC diffs actually use): codes now mean the wrong
    # categories, so the decode must differ or fail cleanly
    i = good.index(b"\xff\xc4")
    # DHT payload: [0x00][16 bits counts][12 values 0..11]...
    vals_at = i + 4 + 1 + 16 + 4
    assert good[vals_at : vals_at + 2] == b"\x04\x05"
    bad = good[:vals_at] + b"\x05\x04" + good[vals_at + 2 :]
    r = decode_media_features(
        _media_df(spark, [(3, bytearray(bad))])
    ).collect()[0]
    assert (not r.decoded) or r.mean_r != base.mean_r


# --- round 7: G.711 mu-law, a real companded audio codec ---------------------
def test_mulaw_round_trip_matches_integer_replay(spark):
    """The decoded rms/peak equal an independent pure-Python replay of
    the CCITT expansion — one wrong shift or bias moves them."""
    import math

    from csvb_spark.operators.multimodal import mulaw_round_trip

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    for r in mulaw_round_trip(docs).collect():
        n = 400 + r.doc_id % 100
        pcm = []
        for i in range(n):
            x = 255 - ((i * 7 + r.doc_id * 13) % 256)
            t = (((x & 15) << 3) + 132) << ((x >> 4) & 7)
            pcm.append(132 - t if x & 0x80 else t - 132)
        assert r.decoded and (r.n_channels, r.sample_rate) == (1, 8000)
        assert r.n_samples == n
        assert r.rms == round(
            math.sqrt((sum(s * s for s in pcm) / 1073741824.0) / n), 6
        )
        assert r.peak == round(max(abs(s) for s in pcm) / 32768.0, 6)


def test_mulaw_extremes_decode_to_known_samples(spark):
    """Known G.711 anchor points: byte 0x7F decodes to 0 (positive
    zero), 0xFF to 0 (negative zero), 0x00 to -32124 (the mu-law
    maximum magnitude) — checked through a hand-built WAV payload."""
    import struct as _struct

    from csvb_spark.operators.multimodal import decode_media_features

    data = bytes([0x00, 0x7F, 0xFF, 0x80])
    fmt = _struct.pack("<HHIIHHH", 7, 1, 8000, 8000, 1, 8, 0)
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + _struct.pack("<I", len(body)) + body
    r = decode_media_features(
        _media_df(spark, [(1, bytearray(wav))])
    ).collect()[0]
    assert r.decoded and r.n_samples == 4
    # peak = |-32124| / 32768; byte 0x80 is +32124 (sign bit clear
    # after inversion), bytes 0x7F/0xFF are the two zeros
    assert r.peak == 32124 / 32768.0


def test_mulaw_corrupt_and_pcm_regression(spark):
    """A truncated mu-law RIFF falls through decoded=false, and plain
    PCM WAVs still take the stdlib wave path (regression)."""
    from csvb_spark.operators.multimodal import (
        decode_media_features,
        synthesize_media,
        synthesize_mulaw,
    )

    docs = spark.createDataFrame([(2,)], "doc_id bigint")
    mu = bytes(synthesize_mulaw(docs).collect()[0].payload)
    r = decode_media_features(
        _media_df(spark, [(2, bytearray(mu[:20]))])
    ).collect()[0]
    assert not r.decoded
    pcm = decode_media_features(
        synthesize_media(docs)  # even id → 16-bit PCM WAV
    ).collect()[0]
    assert pcm.decoded and pcm.kind == "audio" and pcm.sample_rate == 8000


def test_alaw_decode_matches_integer_replay(spark):
    """A-law (format tag 6) expands via the CCITT segment law; the
    decoded rms/peak equal an independent pure-Python replay, and the
    known anchor byte 0x55 (xor -> 0) decodes to -8."""
    import math

    from csvb_spark.operators.multimodal import (
        decode_media_features,
        synthesize_mulaw,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    got = {
        r.doc_id: r
        for r in decode_media_features(
            synthesize_mulaw(docs, law="a")
        ).collect()
    }

    def expand(b):
        x = b ^ 0x55
        seg = (x & 0x70) >> 4
        t = (x & 15) << 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if x & 0x80 else -t

    assert expand(0x55) == -8  # anchor: quietest negative step
    assert max(abs(expand(b)) for b in range(256)) == 32256  # A-law max
    for d in range(6):
        n = 400 + d % 100
        pcm = [expand((i * 7 + d * 13) % 256) for i in range(n)]
        r = got[d]
        assert r.decoded and r.n_samples == n and r.sample_rate == 8000
        assert r.rms == float(
            math.sqrt((sum(s * s for s in pcm) / 1073741824.0) / n)
        )
        assert r.peak == max(abs(s) for s in pcm) / 32768.0


def test_synthesizers_reject_negative_ids(spark):
    """Negative doc ids would silently diverge from the SQL oracles
    (Python % is non-negative, SQL % follows the sign) — every
    synthesizer fails cleanly instead (round-7 ADVICE)."""
    import pytest

    from csvb_spark.operators import multimodal as M

    docs = spark.createDataFrame([(-1,), (2,)], "doc_id bigint")
    for fn in (
        M.synthesize_media,
        M.synthesize_png,
        M.synthesize_jpeg,
        M.synthesize_mulaw,
    ):
        with pytest.raises(Exception, match="non-negative"):
            fn(docs).collect()


def test_adpcm_round_trip_matches_pure_python_replay(spark):
    """IMA ADPCM (WAV tag 17): the Spark decode of the synthesized
    payload is BIT-EXACT vs an independent pure-Python decode of the
    same bytes, and the reconstructed signal stays within the 4-bit
    quantization tolerance of the source sawtooth — one wrong step
    update or nibble order diverges immediately (the state machine
    feeds every later sample)."""
    import math

    from csvb_spark.operators.multimodal import (
        adpcm_round_trip,
        synthesize_adpcm,
    )

    STEP = (
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
    INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)

    def py_decode(payload: bytes):
        # independent reference: RIFF walk + IMA expansion
        pos, fmt, data, fact_n = 12, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = payload[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            elif cid == b"fact":
                fact_n = int.from_bytes(body[:4], "little")
        block_align = int.from_bytes(fmt[12:14], "little")
        sr = int.from_bytes(fmt[4:8], "little")
        out = []
        for bs in range(0, len(data) - 3, block_align):
            blk = data[bs : bs + block_align]
            pred = int.from_bytes(blk[0:2], "little", signed=True)
            idx = blk[2]
            out.append(pred)
            for byte in blk[4:]:
                for nib in (byte & 15, byte >> 4):
                    step = STEP[idx]
                    delta = step >> 3
                    if nib & 1:
                        delta += step >> 2
                    if nib & 2:
                        delta += step >> 1
                    if nib & 4:
                        delta += step
                    pred += -delta if nib & 8 else delta
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + INDEX[nib & 7]))
                    out.append(pred)
        return sr, out[:fact_n]

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in synthesize_adpcm(docs).collect()
    }
    for r in adpcm_round_trip(docs).collect():
        n = 1200 + r.doc_id % 301
        sr, ref = py_decode(payloads[r.doc_id])
        assert sr == 8000
        assert r.decoded and (r.n_channels, r.sample_rate) == (1, 8000)
        assert r.n_samples == n == len(ref)
        assert r.duration_ms == round(n * 1000.0 / 8000, 6)
        # bit-exact vs the independent decode
        assert r.rms == round(
            math.sqrt(sum(s * s for s in ref) / 1073741824.0 / n), 6
        )
        assert r.peak == round(max(abs(s) for s in ref) / 32768.0, 6)
        # lossy-but-close vs the SOURCE signal: 4-bit ADPCM tracks a
        # sawtooth within a few percent rms
        a, b = 37 + r.doc_id % 11, r.doc_id * 13 % 4001
        src = [(((i * a + b) % 4001) - 2000) * 8 for i in range(n)]
        src_rms = math.sqrt(sum(s * s for s in src) / 1073741824.0 / n)
        assert abs(r.rms - src_rms) / src_rms < 0.05, (r.rms, src_rms)


# --- GIF87a / LZW (round 12) ----------------------------------------------------


def _gif_ref_encode(idx: np.ndarray, palette: bytes) -> bytes:
    """INDEPENDENT test-side GIF87a writer (dict-of-tuples LZW with
    its own width/reset bookkeeping, written against the spec, not
    against the engine code) — payloads it produces exercise the
    engine DECODER from a second implementation, so a shared-author
    off-by-one in the code-width bump cannot cancel out."""
    import struct

    h, w = idx.shape
    mcs, clear, eoi = 8, 256, 257
    out = bytearray()
    acc = [0, 0]  # bit accumulator, bit count

    def emit(code, width):
        acc[0] |= code << acc[1]
        acc[1] += width
        while acc[1] >= 8:
            out.append(acc[0] & 0xFF)
            acc[0] >>= 8
            acc[1] -= 8

    table = {(i,): i for i in range(256)}
    nxt, cs = 258, 9
    emit(clear, cs)
    seq = tuple()
    for s in idx.reshape(-1).tolist():
        cand = seq + (s,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], cs)
        if nxt < 4096:
            table[cand] = nxt
            if nxt == (1 << cs) and cs < 12:
                cs += 1
            nxt += 1
        else:
            emit(clear, cs)
            table = {(i,): i for i in range(256)}
            nxt, cs = 258, 9
        seq = (s,)
    emit(table[seq], cs)
    emit(eoi, cs)
    if acc[1]:
        out.append(acc[0] & 0xFF)
    blocks = b"".join(
        bytes([len(out[i : i + 255])]) + bytes(out[i : i + 255])
        for i in range(0, len(out), 255)
    )
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([8])
        + blocks
        + b"\x00\x3b"
    )


def test_gif_round_trip_means_match_numpy(spark, sf_dir):
    """Engine encode→decode at fixture sizes: decoded channel means
    equal the arithmetic prediction exactly (same math as the x139
    SQL oracle)."""
    from csvb_spark.operators.multimodal import gif_round_trip

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    for r in gif_round_trip(docs).collect():
        d = r.doc_id
        w, h = 6 + d % 9, 5 + d % 7
        y, x = np.mgrid[0:h, 0:w]
        idx = (x * 5 + y * 11 + d) % 256
        assert r.decoded and (r.width, r.height) == (w, h)
        assert r.mean_r == round(float(idx.mean()), 6)
        assert r.mean_g == round(float(((idx * 3) % 256).mean()), 6)
        assert r.mean_b == round(float(((idx * 7) % 256).mean()), 6)


def test_gif_lzw_deep_table_and_reset_round_trip(spark):
    """Engine encoder vs engine decoder on a noisy upscaled canvas
    whose LZW table provably crosses every code width AND the
    4096-entry reset (proven by replaying the identical greedy
    phrase walk in the test: same input → same phrase sequence →
    same table growth as the engine encoder)."""
    from csvb_spark.operators.multimodal import (
        decode_media_features,
        synthesize_gif,
    )

    doc_id = 7  # w=(6+7%9)*12=156, h=(5+7%7)*12=60 → 9360 px
    docs = spark.createDataFrame([(doc_id,)], "doc_id bigint")
    media = synthesize_gif(docs, upscale=12, noisy=True)
    w, h = 156, 60
    y, x = np.mgrid[0:h, 0:w]
    idx = (x * 197 + y * 101 + (x * y) % 251 + doc_id) % 256

    # replay the greedy LZW phrase walk to count table entries
    table = {(i,): i for i in range(256)}
    nxt, resets = 258, 0
    seq = tuple()
    for s in idx.reshape(-1).tolist():
        cand = seq + (s,)
        if cand in table:
            seq = cand
            continue
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
        else:
            table = {(i,): i for i in range(256)}
            nxt, resets = 258, resets + 1
        seq = (s,)
    assert resets >= 1  # the 4096-entry CLEAR/reset path really ran

    r = decode_media_features(media).collect()[0]
    assert r.decoded and (r.width, r.height) == (w, h)
    assert r.mean_r == round(float(idx.mean()), 6)
    assert r.mean_g == round(float(((idx * 3) % 256).mean()), 6)
    assert r.mean_b == round(float(((idx * 7) % 256).mean()), 6)


def test_gif_decoder_reads_independent_encoder_payloads(spark):
    """Engine decoder vs the INDEPENDENT test encoder on random
    indices (worst-case table growth, KwKwK patterns, width bumps,
    resets) plus a pathological run-of-one-symbol canvas (maximal
    KwKwK chains). Also: corrupt/truncated payloads and GIF89a
    extension blocks."""
    from csvb_spark.operators.multimodal import decode_media_features

    palette = bytes(v for i in range(256) for v in (i, (i * 3) % 256, (i * 7) % 256))
    rng = np.random.default_rng(7)
    rand_idx = rng.integers(0, 256, size=(70, 110), dtype=np.uint8)  # 7700 px
    runs_idx = np.zeros((40, 50), dtype=np.uint8)  # KwKwK-heavy
    payload_rand = _gif_ref_encode(rand_idx, palette)
    payload_runs = _gif_ref_encode(runs_idx, palette)
    # splice a GIF89a graphic-control extension in front of the image
    # descriptor of the runs payload and relabel the header
    idesc = payload_runs.index(b"\x2c", 13 + 768)
    payload_89a = (
        b"GIF89a"
        + payload_runs[6:idesc]
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        + payload_runs[idesc:]
    )
    rows = [
        (1, payload_rand, "image/gif"),
        (2, payload_runs, "image/gif"),
        (3, payload_89a, "image/gif"),
        (4, payload_rand[:80], "image/gif"),  # truncated mid-palette
        (5, payload_rand[:-40], "image/gif"),  # truncated LZW stream
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary, mime string")
    got = {r.doc_id: r for r in decode_media_features(df).collect()}
    for doc, idx in ((1, rand_idx), (2, runs_idx), (3, runs_idx)):
        r = got[doc]
        assert r.decoded, doc
        assert (r.height, r.width) == idx.shape
        assert r.mean_r == round(float(idx.astype(float).mean()), 6)
        assert r.mean_g == round(float(((idx.astype(int) * 3) % 256).mean()), 6)
        assert r.mean_b == round(float(((idx.astype(int) * 7) % 256).mean()), 6)
    assert not got[4].decoded and not got[5].decoded


def test_gif_golden_external_bytes_decode(spark):
    """Interop pin against a KNOWN-GOOD EXTERNAL artifact (round-12
    ADVICE: the independent test encoder shares this author, so a
    convention-level spec misreading could cancel out between the two
    encoders and the decoder; these bytes were produced by neither).
    The payload is the classic 42-byte transparent spacer GIF —
    byte-exact as published and browser-decoded for decades
    (base64 ``R0lGODlh...``). It pins the container walk (GIF89a
    header, 2-color global palette, graphic-control-extension skip),
    the LSB-first code packing, CLEAR handling, and the
    missing-EOI tolerance every real decoder has (the stream ends
    after one pixel code with NO end-of-information code — rejecting
    it as truncation was a real interop gap this test caught).
    Scope note: at 1x1 the stream never reaches a code-width bump, so
    the 9->12-bit bump convention remains pinned only by the
    independent-encoder test above — no external artifact exercising
    it is constructible in this container (no PIL/tk/imagemagick, by
    design; see the codec-frontier note in SURVEY §7)."""
    import base64

    from csvb_spark.operators.multimodal import decode_media_features

    gold = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    assert len(gold) == 42 and gold[:6] == b"GIF89a"
    df = spark.createDataFrame(
        [(1, gold, "image/gif")], "doc_id bigint, payload binary, mime string"
    )
    r = decode_media_features(df).collect()[0]
    assert r.decoded and r.kind == "image"
    assert (r.width, r.height) == (1, 1)
    # single pixel = palette[0] = black
    assert (r.mean_r, r.mean_g, r.mean_b) == (0.0, 0.0, 0.0)


def test_png_golden_external_bytes_decode(spark):
    """PNG interop pin against KNOWN-GOOD EXTERNAL artifacts (round-14
    VERDICT item 6 — the GIF golden caught a real missing-EOI gap on
    day one; the PNG scanline-filter walk deserves the same). The
    payloads are the two ubiquitous published 70-byte 1x1 data-URI
    PNGs (the base64 strings pasted across a decade of web answers as
    'smallest PNG'); both are 8-bit RGBA (color type 6) with a
    Sub-filtered scanline — produced by neither our encoder nor our
    test encoder. The test first re-verifies each artifact's own
    integrity (signature, per-chunk CRC32, IDAT inflates to exactly
    one filtered scanline) so a transcription typo fails as artifact
    corruption, not as a phantom decoder bug; then pins the decode.
    Detail the decode exposes: the string usually labeled 'transparent
    png' is actually a half-alpha RED pixel (inflated scanline
    01 ff 00 00 7f) — the bytes, not the folklore, are the spec."""
    import base64
    import binascii
    import struct
    import zlib

    from csvb_spark.operators.multimodal import decode_media_features

    goldens = {
        # (mean_r, mean_g, mean_b) of the single RGBA pixel
        1: (
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
            "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==",
            (255.0, 0.0, 0.0),  # filtered 01 ff 00 00 7f → (255,0,0,127)
        ),
        2: (
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
            "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==",
            (0.0, 0.0, 255.0),  # filtered 01 00 00 ff 7f → (0,0,255,127)
        ),
    }
    rows = []
    for doc_id, (b64, _) in goldens.items():
        raw = base64.b64decode(b64)
        assert len(raw) == 70 and raw[:8] == b"\x89PNG\r\n\x1a\n"
        # integrity walk: every chunk CRC-checks, IHDR says 1x1 RGBA,
        # the IDAT inflates to one 5-byte Sub-filtered scanline
        pos = 8
        while pos < len(raw):
            ln, typ = struct.unpack(">I4s", raw[pos : pos + 8])
            data = raw[pos + 8 : pos + 8 + ln]
            crc = struct.unpack(">I", raw[pos + 8 + ln : pos + 12 + ln])[0]
            assert binascii.crc32(typ + data) & 0xFFFFFFFF == crc, typ
            if typ == b"IHDR":
                assert struct.unpack(">IIBBBBB", data) == (1, 1, 8, 6, 0, 0, 0)
            if typ == b"IDAT":
                scanline = zlib.decompress(data)
                assert len(scanline) == 5 and scanline[0] == 1  # Sub
            pos += 12 + ln
        rows.append((doc_id, raw, "image/png"))
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, mime string"
    )
    got = {r.doc_id: r for r in decode_media_features(df).collect()}
    for doc_id, (_, rgb) in goldens.items():
        r = got[doc_id]
        assert r.decoded and r.kind == "image", doc_id
        assert (r.width, r.height, r.n_channels) == (1, 1, 4), doc_id
        assert (r.mean_r, r.mean_g, r.mean_b) == rgb, doc_id


def test_jpeg_golden_external_bytes_decode(spark):
    """JPEG interop pin against KNOWN-GOOD EXTERNAL artifacts (round-15
    VERDICT item 6 — the most convention-dense decoder in the tree was
    still pinned only by the repo's own 4:4:4 encoder). Two published
    byte-stable baseline JFIFs produced by neither our encoder nor the
    test encoder:

    - ``python.jpg`` (543 bytes) — CPython's own test-suite fixture
      (Lib/test/imghdrdata/python.jpg), md5
      50e9104383c3f36fa9e9be6148e6fdf3, byte-identical across the
      2.7.18 / 3.6-3.12 release tarballs on this host. Baseline SOF0,
      16x16, 3 components with 2x2/1x1/1x1 sampling — i.e. 4:2:0
      chroma subsampling, which the decoder REJECTED before this
      golden (the predicted find: interleaved-MCU layout + per-plane
      upsample were missing).
    - ``2x2.jpg`` (331 bytes) — IPython's test fixture
      (IPython/core/tests/2x2.jpg), md5
      0dfb62cd080fc2ad9c8204c805e68ce8. Baseline SOF0, 2x2, ONE
      component — grayscale, also rejected before this golden.

    Ground truth is the JVM's production ``javax.imageio`` decoder,
    read at the RASTER level at runtime (``getRGB()`` would
    gamma-convert the linear-gray raster to sRGB: the grayscale
    image's flat 128 reads back as 188 through getRGB — the bytes,
    not the first API you grab, are the spec). Grayscale must match
    the raster bit-exactly (no upsampling, no color convert, flat DC
    block). The subsampled image is allowed |delta| <= 2.0 per
    channel: our replication upsample vs ImageIO's triangular 'fancy'
    chroma upsample differ legitimately (measured deltas 0.08 / 0.03
    / 1.16); width/height/decoded are exact."""
    import base64
    import hashlib

    from csvb_spark.operators.multimodal import decode_media_features

    python_jpg = base64.b64decode(
        "/9j/4AAQSkZJRgABAQEAAQABAAD/2wBDAAMCAgICAgMCAgIDAwMDBAYEBAQEBAgG"
        "BgUGCQgKCgkICQkKDA8MCgsOCwkJDRENDg8QEBEQCgwSExIQEw8QEBD/2wBDAQMD"
        "AwQDBAgEBAgQCwkLEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQ"
        "EBAQEBAQEBAQEBAQEBD/wAARCAAQABADASIAAhEBAxEB/8QAFgABAQEAAAAAAAAA"
        "AAAAAAAABwQF/8QAJBAAAQQBBAICAwAAAAAAAAAAAQIDBAYFBwgSExEiABQJMTL/"
        "xAAVAQEBAAAAAAAAAAAAAAAAAAAABv/EACMRAAECBQMFAAAAAAAAAAAAAAECEQME"
        "BQYhABIxFRZhgeH/2gAMAwEAAhEDEQA/ABSm0mobc8HmExLUlRzzEWPkJWW+ulrs"
        "aUVAseUgslSlH9LKuPryIKuWPZdskzXmm3fX5m2nF4GlVxx/HOpx4ks51+MiU/Ia"
        "ad7UcUo4tILoS4kqcWkezS0hO/HvuRp0rO6hWnWO1UisZVuFi4GFeyEpmGepa5S5"
        "SWVPuciFKRFLgSrwetnyPIB+Vb4N9mKhQMzo5po9XLdDs9d6ZVix2VEhiL9kuNPx"
        "w2gEKcDQ/rs8AuA8VAe0vdl7VOYn+27flGAUgmITjbhSmCg3BYlyeWDkMolvw4KO"
        "p1KM6iCNvngZHwetf//Z"
    )
    gray_jpg = base64.b64decode(
        "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkS"
        "Ew8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAC"
        "AAIBAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgED"
        "AwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2Jy"
        "ggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1"
        "dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJ"
        "ytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/ACv/2Q=="
    )
    assert hashlib.md5(python_jpg).hexdigest() == (
        "50e9104383c3f36fa9e9be6148e6fdf3"
    )
    assert hashlib.md5(gray_jpg).hexdigest() == (
        "0dfb62cd080fc2ad9c8204c805e68ce8"
    )

    # integrity walk: marker-structured to EOI, baseline SOF0 with the
    # documented dims/sampling — a transcription typo fails HERE as
    # artifact corruption, not as a phantom decoder bug
    def _walk(p, want):
        assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
        pos, sof = 2, None
        while pos < len(p) - 2:
            assert p[pos] == 0xFF, pos
            m = p[pos + 1]
            if m == 0xDA:
                break
            ln = int.from_bytes(p[pos + 2 : pos + 4], "big")
            if m == 0xC0:
                h = int.from_bytes(p[pos + 5 : pos + 7], "big")
                w = int.from_bytes(p[pos + 7 : pos + 9], "big")
                nc = p[pos + 9]
                samps = [p[pos + 11 + 3 * c] for c in range(nc)]
                sof = (w, h, nc, samps)
            assert m not in (0xC2, 0xC1, 0xC3), "baseline only"
            pos += 2 + ln
        assert sof == want, sof

    _walk(python_jpg, (16, 16, 3, [0x22, 0x11, 0x11]))
    _walk(gray_jpg, (2, 2, 1, [0x11]))

    df = spark.createDataFrame(
        [(1, python_jpg, "image/jpeg"), (2, gray_jpg, "image/jpeg")],
        "doc_id bigint, payload binary, mime string",
    )
    got = {r.doc_id: r for r in decode_media_features(df).collect()}

    # runtime independent oracle: javax.imageio raster-level decode
    import os
    import tempfile

    jvm = spark._jvm
    ref = {}
    for doc_id, payload in ((1, python_jpg), (2, gray_jpg)):
        fd, tmp = tempfile.mkstemp(suffix=".jpg")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(payload)
            img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(tmp))
            ras = img.getRaster()
            w, h, nb = img.getWidth(), img.getHeight(), ras.getNumBands()
            sums = [0] * nb
            for y in range(h):
                for x in range(w):
                    for b in range(nb):
                        sums[b] += ras.getSample(x, y, b)
            ref[doc_id] = (w, h, [s / (w * h) for s in sums])
        finally:
            os.unlink(tmp)

    # subsampled color image: exact dims, means within the documented
    # upsampling-filter tolerance of the production decoder
    r1 = got[1]
    w1, h1, m1 = ref[1]
    assert r1.decoded and (r1.width, r1.height) == (w1, h1) == (16, 16)
    for ours, theirs in zip((r1.mean_r, r1.mean_g, r1.mean_b), m1):
        assert abs(ours - theirs) <= 2.0, (ours, theirs)

    # grayscale: single flat DC block — bit-exact against the raster
    r2 = got[2]
    w2, h2, m2 = ref[2]
    assert r2.decoded and (r2.width, r2.height) == (w2, h2) == (2, 2)
    assert len(m2) == 1 and m2[0] == 128.0
    assert (r2.mean_r, r2.mean_g, r2.mean_b) == (128.0, 128.0, 128.0)


def test_wav_golden_external_bytes_decode(spark):
    """WAV interop pin against KNOWN-GOOD EXTERNAL artifacts (the
    round-14 verdict named "JPEG and the WAV family" as the last
    decoders pinned only by our own encoder; JPEG landed earlier this
    round). CPython's own test-suite fixtures
    ``Lib/test/audiodata/pluck-pcm{8,16,24,32}.wav`` — published,
    byte-stable (md5-pinned below against the copy shipped inside
    this host's CPython install), and the first STEREO and the first
    24-BIT external WAV bytes the decoder has seen. The 24-bit file
    was the predicted find (golden streak 4-for-4): stdlib ``wave``
    reports sampwidth 3, which ``_decode_wav`` mapped to no numpy
    dtype and rejected as ``decoded=False`` before this test.

    Ground truth is computed here with PURE-PYTHON byte unpacking
    (``int.from_bytes`` per sample, explicit sign extension) — fully
    independent of the decoder's numpy compose/sign-extend path. All
    four fixtures carry the same plucked-string recording, so the
    four decoded rms values must also agree with each other to within
    8-bit quantization error — a wrong 24-bit sign extension fails
    that cross-width check by orders of magnitude."""
    import hashlib
    import math
    import os
    import wave

    import pytest

    from csvb_spark.operators.multimodal import decode_media_features

    fix_dir = os.path.join(
        os.path.dirname(os.path.abspath(wave.__file__)), "test", "audiodata"
    )
    if not os.path.isdir(fix_dir):
        pytest.skip("CPython test/audiodata fixtures not on this host")
    md5s = {
        8: "1279235abb00e2bbd25f33be9b13c06e",
        16: "263f463cc93d29413dd1955d560cf70b",
        24: "95fa93fe473ea60cdde314dc9725730f",
        32: "865bb0bdb9f34c5e6795ff34b20f3533",
    }
    payloads = {}
    for bits, want_md5 in md5s.items():
        path = os.path.join(fix_dir, f"pluck-pcm{bits}.wav")
        if not os.path.exists(path):
            pytest.skip(f"fixture {path} missing")
        p = open(path, "rb").read()
        assert hashlib.md5(p).hexdigest() == want_md5, bits
        payloads[bits] = p

    # independent ground truth: stdlib wave header walk + pure-Python
    # sample unpack (no numpy anywhere on this side)
    ref = {}
    for bits, p in payloads.items():
        import io

        with wave.open(io.BytesIO(p), "rb") as w:
            nch, sw, sr, n = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
            raw = w.readframes(n)
        assert (nch, sw, sr, n) == (2, bits // 8, 11025, 3307), bits
        full = float(1 << (8 * sw - 1))
        vals = []
        for i in range(0, len(raw), sw):
            u = int.from_bytes(raw[i : i + sw], "little")
            if sw == 1:
                s = u - 128
            else:
                s = u - (1 << (8 * sw)) if u >= (1 << (8 * sw - 1)) else u
            vals.append(s / full)
        rms = math.sqrt(sum(v * v for v in vals) / len(vals))
        peak = max(abs(v) for v in vals)
        ref[bits] = (nch, sr, n, rms, peak)

    df = spark.createDataFrame(
        [(bits, p, "audio/wav") for bits, p in payloads.items()],
        "doc_id bigint, payload binary, mime string",
    )
    got = {r.doc_id: r for r in decode_media_features(df).collect()}

    for bits in md5s:
        r = got[bits]
        nch, sr, n, rms, peak = ref[bits]
        assert r.decoded and r.kind == "audio", bits
        assert (r.n_channels, r.sample_rate, r.n_samples) == (nch, sr, n)
        assert r.duration_ms == round(n * 1000.0 / sr, 6), bits
        # same arithmetic, different summation order (numpy pairwise
        # vs python serial) — tight relative tolerance, not equality
        assert abs(r.rms - rms) <= 1e-9 * max(rms, 1.0), (bits, r.rms, rms)
        assert abs(r.peak - peak) <= 1e-12, (bits, r.peak, peak)

    # cross-width: one recording, four quantizations — rms must agree
    # to ~1 LSB of the coarsest width (8-bit), i.e. << 1/128
    rmss = [got[b].rms for b in (8, 16, 24, 32)]
    assert max(rmss) - min(rmss) < 1.0 / 128.0, rmss
