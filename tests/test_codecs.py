"""Pure-python codec tests: PNG/WAV/Y4M round-trips, conformance
details (CRCs, filter types), and failure modes — no Spark needed."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from clickhouse_build_spark.operators.codecs import (
    decode_png_gray,
    decode_wav_pcm8,
    decode_y4m_mono,
    encode_png_gray,
    encode_wav_pcm8,
    encode_y4m_mono,
)

RNG = np.random.default_rng(42)


def test_png_round_trip_random_content():
    pix = RNG.integers(0, 256, (48, 64), dtype=np.uint8)
    payload = encode_png_gray(pix)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert (decode_png_gray(payload) == pix).all()


def test_png_rejects_corruption():
    pix = RNG.integers(0, 256, (8, 8), dtype=np.uint8)
    payload = bytearray(encode_png_gray(pix))
    with pytest.raises(ValueError, match="signature"):
        decode_png_gray(b"JUNK" + bytes(payload))
    payload[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(payload))


def _png_with_filters(pix: np.ndarray, ftypes: list[int]) -> bytes:
    """Encode with explicit per-row filter types (a third-party encoder
    shape our filter-0-only encoder never emits) to prove the decoder
    implements the full PNG filter spec."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    h, w = pix.shape
    raw = b""
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        line = pix[r].astype(np.int32)
        ft = ftypes[r % len(ftypes)]
        enc = line.copy()
        if ft == 1:
            enc[1:] = (line[1:] - line[:-1]) % 256
        elif ft == 2:
            enc = (line - prev) % 256
        elif ft == 3:
            for x in range(w):
                left = line[x - 1] if x else 0
                enc[x] = (line[x] - (left + prev[x]) // 2) % 256
        elif ft == 4:
            for x in range(w):
                left = line[x - 1] if x else 0
                ul = prev[x - 1] if x else 0
                enc[x] = (line[x] - paeth(left, prev[x], ul)) % 256
        raw += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_handles_all_five_filter_types():
    pix = RNG.integers(0, 256, (20, 33), dtype=np.uint8)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert (decode_png_gray(_png_with_filters(pix, ftypes)) == pix).all()


def test_wav_round_trip():
    samples = RNG.integers(0, 256, (16000,), dtype=np.uint8)
    rate, back = decode_wav_pcm8(encode_wav_pcm8(samples, 16000))
    assert rate == 16000
    assert (back == samples).all()


def test_y4m_round_trip_and_fps():
    frames = [RNG.integers(0, 256, (48, 64), dtype=np.uint8) for _ in range(5)]
    payload = encode_y4m_mono(frames, fps_num=1000, fps_den=500)
    assert payload.startswith(b"YUV4MPEG2 ")
    w, h, fn, fd, back = decode_y4m_mono(payload)
    assert (w, h, fn, fd) == (64, 48, 1000, 500)
    assert len(back) == 5
    assert all((a == b).all() for a, b in zip(frames, back))


def test_y4m_rejects_non_mono():
    bad = b"YUV4MPEG2 W4 H4 F2:1 Ip A1:1 C420\n" + b"FRAME\n" + b"\x00" * 24
    with pytest.raises(ValueError, match="Cmono"):
        decode_y4m_mono(bad)


def test_corpus_payloads_are_real_containers():
    """The sf-scaled corpus writer emits genuinely decodable bytes whose
    decoded content is the md5-seeded pattern the oracles reproduce."""
    from clickhouse_build_spark.operators.multimodal import (
        _media_geometry,
        _real_payload,
    )

    for i in range(12):
        kind, meta = _media_geometry(i)
        p = _real_payload(i)
        digest = hashlib.md5(f"media:{i}".encode()).digest()
        if kind == "image" and meta["format"] == "jpeg":
            from clickhouse_build_spark.operators.jpeg import decode_jpeg_gray

            pix = decode_jpeg_gray(p)
            assert pix.shape == (meta["height"], meta["width"])
            # 8×8-constant tiles cycling the digest, exact round-trip
            assert (pix[:8, :8] == digest[0]).all()
            assert (pix[:8, 8:16] == digest[1]).all()
        elif kind == "image":
            pix = decode_png_gray(p)
            assert pix.shape == (meta["height"], meta["width"])
            assert bytes(pix.reshape(-1)[:16]) == digest
        elif kind == "audio" and meta["format"] == "adpcm":
            from clickhouse_build_spark.operators.adpcm import decode_wav_adpcm

            rate, samples = decode_wav_adpcm(p)
            assert rate == meta["sample_rate"]
            assert len(samples) * 1000 // rate == meta["duration_ms"]
            # constant per 250 ms window, bit-exact through the nibbles
            b0 = hashlib.md5(f"rms:{digest.hex()}:0".encode()).digest()[0]
            assert (samples[:4000] == (b0 - 128) * 256).all()
        elif kind == "audio" and meta["format"] == "mdct":
            from clickhouse_build_spark.operators.mdct import decode_mdct

            rate, samples = decode_mdct(p)
            assert rate == meta["sample_rate"]
            assert len(samples) * 1000 // rate == meta["duration_ms"]
            # every constant window reconstructs bit-exactly through
            # the transform chain at the near-lossless step
            for wi in range(meta["duration_ms"] // 250):
                bw = hashlib.md5(
                    f"rms:{digest.hex()}:{wi * 250}".encode()
                ).digest()[0]
                assert (
                    samples[wi * 4000 : (wi + 1) * 4000]
                    == (bw - 128) * 256
                ).all(), wi
        elif kind == "audio":
            rate, samples = decode_wav_pcm8(p)
            assert rate == meta["sample_rate"]
            assert len(samples) * 1000 // rate == meta["duration_ms"]
        elif kind == "video" and meta["format"] == "avi":
            from clickhouse_build_spark.operators.avi import decode_avi_mjpeg

            w, h, interval, frames = decode_avi_mjpeg(p)
            assert (w, h, interval) == (meta["width"], meta["height"], 500)
            assert len(frames) == meta["duration_ms"] // 500
            # MJPEG frames: 8×8-constant tiles cycling the frame digest
            f0 = hashlib.md5(
                f"frame:{digest.hex()}:0".encode()
            ).digest()
            assert (frames[0][:8, :8] == f0[0]).all()
        elif kind == "video" and meta["format"] == "pframe":
            from clickhouse_build_spark.operators.pframe import (
                decode_avi_pframe,
            )

            w, h, interval, frames = decode_avi_pframe(p)
            assert (w, h, interval) == (meta["width"], meta["height"], 500)
            assert len(frames) == meta["duration_ms"] // 500
            # every frame reconstructs bit-exactly through the P-frame
            # chain: constant tiles in [64, 191] (b//2 + 64)
            for k, fr in enumerate(frames):
                fk = hashlib.md5(
                    f"frame:{digest.hex()}:{k * 500}".encode()
                ).digest()
                assert (fr[:8, :8] == fk[0] // 2 + 64).all()
        else:
            w, h, fn, fd, frames = decode_y4m_mono(p)
            assert (w, h) == (meta["width"], meta["height"])
            assert len(frames) == meta["duration_ms"] // 500


def test_avi_mjpeg_roundtrip_and_structure():
    """MJPEG-AVI container: bit-exact frame round-trip on the oracle
    content shape, RIFF structure, word-aligned odd-size chunks, and
    loud failures on garbage/truncation."""
    import numpy as np
    import pytest

    from clickhouse_build_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(77)
    frames = [
        np.kron(rng.integers(0, 256, (6, 8), np.uint8), np.ones((8, 8), np.uint8))
        for _ in range(5)
    ]
    avi = encode_avi_mjpeg(frames, fps=2)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert b"MJPG" in avi and b"movi" in avi and b"idx1" in avi
    w, h, interval, dec = decode_avi_mjpeg(avi)
    assert (w, h, interval, len(dec)) == (64, 48, 500, 5)
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    # container beats raw on blocky content (it IS compressed video)
    assert len(avi) < sum(f.size for f in frames) // 2

    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_mjpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_avi_mjpeg(avi[: len(avi) // 3])
    with pytest.raises(ValueError, match="at least one"):
        encode_avi_mjpeg([])
