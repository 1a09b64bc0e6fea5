"""Inter-frame (P-frame) delta video codec inside the AVI container.

Composes the baseline JPEG coder (``operators/jpeg.py``) into an
honest INTER-frame format: frame 0 is intra-coded (a plain JPEG);
every following frame stores only the bias-shifted difference to the
previous reconstructed frame (``residual = cur − prev + 128``),
JPEG-coded — the temporal-prediction structure of every real video
codec (H.26x's P-frames), without claiming to be H.264 (no motion
search: the predictor is the co-located pixel, i.e. one zero motion
vector per frame). If a residual falls outside the 8-bit range the
encoder inserts an I-frame instead — the codec's GOP/keyframe
mechanism — and marks it with the standard AVI ``idx1``
``AVIIF_KEYFRAME`` flag, which is how the decoder distinguishes intra
from predicted chunks (fourcc ``PJPG``; same RIFF layout as
``operators/avi.py``'s MJPEG mux otherwise).

Exactness contract (the ADPCM/MJPEG recipe): on 8×8-constant-tile
content with the flat quantization table every JPEG round-trip is
bit-exact, and a difference of two constant tiles is a constant tile,
so the whole reconstruction chain is bit-exact as long as consecutive
frame values stay within ±127 (the corpus writer maps P-frame video
content into [64, 191] to guarantee it). Lossy behavior on arbitrary
content is bounded by the JPEG tests; reconstruction drift is bounded
in tests/test_pframe.py.

With this, the remaining media seam is narrowed to TRANSFORM codecs
with native-library entropy coders (H.264's transform/CABAC pipeline,
AAC) — temporal prediction itself is no longer stubbed.
"""

from __future__ import annotations

import struct

import numpy as np

from clickhouse_build_spark.operators.avi import _chunk, _list
from clickhouse_build_spark.operators.jpeg import (
    FLAT_QTABLE,
    decode_jpeg_gray,
    encode_jpeg_gray,
)

AVIIF_KEYFRAME = 0x10


def encode_avi_pframe(
    frames: list[np.ndarray],
    fps: int = 2,
    qtable: np.ndarray | None = FLAT_QTABLE,
) -> bytes:
    """Encode same-shaped 2-D uint8 frames as P-frame delta video
    (fourcc PJPG): JPEG I-frame, then JPEG-coded +128-biased residuals
    vs the previous RECONSTRUCTED frame (the decoder's state, so
    encoder and decoder can never drift apart), with automatic I-frame
    fallback when a residual exceeds the 8-bit range."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    payloads: list[bytes] = []
    flags: list[int] = []
    prev: np.ndarray | None = None
    for f in frames:
        if f.shape != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be same-shape uint8")
        intra = prev is None
        if not intra:
            res = f.astype(np.int16) - prev.astype(np.int16) + 128
            if res.min() < 0 or res.max() > 255:
                intra = True  # GOP cut: the delta no longer fits 8 bits
        if intra:
            p = encode_jpeg_gray(f, qtable)
            prev = decode_jpeg_gray(p)
        else:
            p = encode_jpeg_gray(res.astype(np.uint8), qtable)
            dec = decode_jpeg_gray(p).astype(np.int16) - 128
            prev = np.clip(prev.astype(np.int16) + dec, 0, 255).astype(
                np.uint8
            )
        payloads.append(p)
        flags.append(AVIIF_KEYFRAME if intra else 0)
    max_size = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, max_size * fps, 0, 0x10,
        len(frames), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"PJPG"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0, 0, 1, fps, 0, len(frames),
            max_size, 0xFFFFFFFF, 0, 0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8, b"PJPG", w * h, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks, idx, offset = [], [], 4
    for p, fl in zip(payloads, flags):
        movi_chunks.append(_chunk(b"00dc", p))
        idx.append(struct.pack("<4sIII", b"00dc", fl, offset, len(p)))
        offset += 8 + len(p) + (len(p) % 2)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_pframe(
    payload: bytes,
) -> tuple[int, int, int, list[np.ndarray]]:
    """Decode PJPG delta video → (width, height, frame_interval_ms,
    frames): RIFF walk for the stream header, the '00dc' chunks and the
    idx1 keyframe flags, then sequential reconstruction — intra chunks
    decode directly, predicted chunks add their −128-biased residual to
    the previous reconstructed frame."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    interval_ms = None
    chunks: list[bytes] = []
    flags: list[int] = []

    def body_fits(pos: int, hi: int) -> bool:
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        return pos + 8 + size <= hi

    def walk(lo: int, hi: int) -> None:
        nonlocal interval_ms
        hi = min(hi, len(payload))
        pos = lo
        while pos + 8 <= hi and body_fits(pos, hi):
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if tag == b"LIST":
                walk(body + 4, body + size)
            elif tag == b"strh":
                if payload[body : body + 4] == b"vids":
                    if payload[body + 4 : body + 8] != b"PJPG":
                        raise ValueError("only PJPG video streams supported")
                    scale, rate = struct.unpack_from("<II", payload, body + 20)
                    if rate:
                        interval_ms = 1000 * scale // rate
            elif tag == b"00dc":
                chunks.append(payload[body : body + size])
            elif tag == b"idx1":
                for off in range(body, body + size, 16):
                    ctag, fl = struct.unpack_from("<4sI", payload, off)
                    if ctag == b"00dc":
                        flags.append(fl)
            pos = body + size + (size & 1)

    walk(12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if interval_ms is None:
        raise ValueError("AVI missing video stream header")
    if not chunks:
        raise ValueError("AVI contains no PJPG frames")
    if len(flags) != len(chunks):
        raise ValueError("idx1 keyframe flags do not cover every frame")
    if not flags[0] & AVIIF_KEYFRAME:
        raise ValueError("first PJPG frame must be intra-coded")
    frames: list[np.ndarray] = []
    prev: np.ndarray | None = None
    for p, fl in zip(chunks, flags):
        img = decode_jpeg_gray(p)
        if fl & AVIIF_KEYFRAME:
            prev = img
        else:
            prev = np.clip(
                prev.astype(np.int16) + img.astype(np.int16) - 128, 0, 255
            ).astype(np.uint8)
        frames.append(prev)
    h, w = frames[0].shape
    return w, h, interval_ms, frames
