"""Minimal AVI (RIFF) container mux/demux for Motion-JPEG video.

Composes the pure-python baseline JPEG codec (``operators/jpeg.py``)
into a REAL compressed video format: MJPEG — every frame an
independently-coded JPEG — inside the standard AVI container
(RIFF 'AVI ' → LIST hdrl (avih + one strl with strh/strf) →
LIST movi ('00dc' chunks) → idx1). Round 7 adds the INTER-frame
sibling (``operators/pframe.py``, fourcc PJPG) on the same container;
the remaining seam is bitstream-compatible codecs whose entropy
coders need native libraries (H.264 CABAC, AAC).

The demuxer is a proper RIFF walk: it locates the 'movi' LIST, decodes
the stream header for frame geometry/rate, and yields each '00dc'
payload — so it reads any MJPEG AVI whose frames our baseline JPEG
decoder supports (8-bit grayscale), not just our own mux. Word
alignment (odd-size chunk pad bytes) is honoured on both sides.

Exactness: the container is lossless framing around the JPEG payloads;
with the corpus's 8×8-constant frame content and the flat quantization
table, every decoded frame round-trips bit-exactly (see
operators/jpeg.py), which keeps MJPEG features SQL-oracle-checkable.
"""

from __future__ import annotations

import struct

import numpy as np

from clickhouse_build_spark.operators.jpeg import (
    FLAT_QTABLE,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _list(tag: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", tag + data)


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    fps: int = 2,
    qtable: np.ndarray | None = FLAT_QTABLE,
) -> bytes:
    """Encode same-shaped 2-D uint8 frames as a grayscale MJPEG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    payloads = []
    for f in frames:
        if f.shape != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be same-shape uint8")
        payloads.append(encode_jpeg_gray(f, qtable))
    max_size = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,    # max bytes per second
        0,                 # padding granularity
        0x10,              # flags: AVIF_HASINDEX
        len(frames), 0,    # total frames, initial frames
        1,                 # streams
        max_size,          # suggested buffer size
        w, h, 0, 0, 0, 0,  # width, height, reserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIIhhhh",
                      0, 0, 0, 0,       # flags, prio, lang, initial frames
                      1, fps,           # scale, rate → fps
                      0, len(frames),   # start, length
                      max_size, 0xFFFFFFFF, 0,  # bufsize, quality, samplesize
                      0, 0, w, h)       # rcFrame
    )
    # BITMAPINFOHEADER, biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8, b"MJPG", w * h, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks, idx, offset = [], [], 4  # offset counts from 'movi' tag
    for p in payloads:
        movi_chunks.append(_chunk(b"00dc", p))
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(p)))
        offset += 8 + len(p) + (len(p) % 2)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(
    payload: bytes,
) -> tuple[int, int, int, list[np.ndarray]]:
    """Decode a grayscale MJPEG AVI → (width, height, frame_interval_ms,
    frames). Walks the RIFF tree for the stream header and the movi
    chunks; every '00dc' payload goes through the baseline JPEG
    decoder."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    interval_ms = None
    frames: list[np.ndarray] = []

    def body_fits(pos: int, hi: int) -> bool:
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        return pos + 8 + size <= hi

    def walk(lo: int, hi: int) -> None:
        nonlocal interval_ms
        # clamp: a truncated stream must fail with the loud ValueError
        # below, not an out-of-bounds struct.error mid-walk
        hi = min(hi, len(payload))
        pos = lo
        while pos + 8 <= hi and body_fits(pos, hi):
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if tag == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif tag == b"strh":
                if payload[body : body + 4] == b"vids":
                    if payload[body + 4 : body + 8] != b"MJPG":
                        raise ValueError("only MJPG video streams supported")
                    scale, rate = struct.unpack_from("<II", payload, body + 20)
                    if rate:
                        interval_ms = 1000 * scale // rate
            elif tag == b"00dc":
                frames.append(decode_jpeg_gray(payload[body : body + size]))
            pos = body + size + (size & 1)  # chunks are word-aligned

    walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if interval_ms is None:
        raise ValueError("AVI missing video stream header")
    if not frames:
        raise ValueError("AVI contains no MJPG frames")
    h, w = frames[0].shape
    return w, h, interval_ms, frames
