"""P-frame delta video codec (operators/pframe.py): round-trip
exactness on the corpus content shape, keyframe/GOP mechanics, drift
bounds on arbitrary content, and container error paths."""

import numpy as np
import pytest

from clickhouse_build_spark.operators.pframe import (
    AVIIF_KEYFRAME,
    decode_avi_pframe,
    encode_avi_pframe,
)

RNG = np.random.default_rng(11)


def _tiles(vals16, h=48, w=64):
    bpr, brows = w // 8, h // 8
    idx = (np.arange(brows)[:, None] * bpr + np.arange(bpr)[None, :]) % 16
    return np.kron(
        np.asarray(vals16, np.uint8)[idx], np.ones((8, 8), np.uint8)
    )


def test_roundtrip_bit_exact_on_constant_tiles():
    # corpus shape: 8x8-constant tiles with values in [64, 191] so every
    # residual fits +-127 -> whole chain bit-exact
    frames = [
        _tiles(RNG.integers(64, 192, 16)) for _ in range(5)
    ]
    payload = encode_avi_pframe(frames, fps=2)
    assert payload[:4] == b"RIFF" and b"PJPG" in payload
    w, h, interval, back = decode_avi_pframe(payload)
    assert (w, h, interval) == (64, 48, 500)
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()


def test_only_first_frame_is_intra_within_residual_range():
    frames = [_tiles([100 + i] * 16) for i in range(4)]
    payload = encode_avi_pframe(frames, fps=2)
    # parse idx1 flags straight out of the container
    import struct

    pos = payload.find(b"idx1")
    (size,) = struct.unpack_from("<I", payload, pos + 4)
    flags = [
        struct.unpack_from("<4sI", payload, off)[1]
        for off in range(pos + 8, pos + 8 + size, 16)
    ]
    assert flags[0] & AVIIF_KEYFRAME
    assert all(not f & AVIIF_KEYFRAME for f in flags[1:])


def test_gop_cut_on_residual_overflow():
    # a 0 -> 255 jump cannot be coded as a biased residual; the encoder
    # must insert an I-frame and still reconstruct exactly
    frames = [_tiles([0] * 16), _tiles([255] * 16), _tiles([200] * 16)]
    payload = encode_avi_pframe(frames, fps=2)
    import struct

    pos = payload.find(b"idx1")
    (size,) = struct.unpack_from("<I", payload, pos + 4)
    flags = [
        struct.unpack_from("<4sI", payload, off)[1]
        for off in range(pos + 8, pos + 8 + size, 16)
    ]
    assert flags[1] & AVIIF_KEYFRAME  # the forced GOP cut
    _, _, _, back = decode_avi_pframe(payload)
    for a, b in zip(frames, back):
        assert (a == b).all()


def test_drift_bounded_on_arbitrary_content():
    # closed-loop prediction (encoder predicts from the DECODED frame)
    # means per-frame error stays at single-JPEG error and never
    # accumulates across the GOP
    frames = [
        RNG.integers(0, 256, (48, 64), dtype=np.uint8) for _ in range(6)
    ]
    payload = encode_avi_pframe(frames, fps=2)
    _, _, _, back = decode_avi_pframe(payload)
    errs = [
        float(np.abs(a.astype(int) - b.astype(int)).mean())
        for a, b in zip(frames, back)
    ]
    assert max(errs) < 16.0
    # no monotone drift: last frame no worse than 2x the first P-frame
    assert errs[-1] < 2 * max(errs[1], 1.0)


def test_container_error_paths():
    frames = [_tiles([100] * 16), _tiles([110] * 16)]
    payload = encode_avi_pframe(frames, fps=2)
    with pytest.raises(ValueError):
        decode_avi_pframe(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_avi_pframe(payload[: len(payload) // 3])
    with pytest.raises(ValueError):
        encode_avi_pframe([])
    # an MJPEG stream must be refused by the PJPG decoder (and vice
    # versa): the fourcc is the dispatch contract
    from clickhouse_build_spark.operators.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    with pytest.raises(ValueError, match="PJPG"):
        decode_avi_pframe(encode_avi_mjpeg(frames, fps=2))
    with pytest.raises(ValueError, match="MJPG"):
        decode_avi_mjpeg(payload)


def test_inter_frame_actually_compresses_static_scenes():
    # a static NOISY scene: every MJPEG frame re-codes the full noise
    # spectrum, while P-frames code a constant-128 residual that the
    # DCT collapses to DC-only -- the inter-frame payload must be much
    # smaller. (On already-DC-only constant-tile content both codecs
    # are near-minimal and the gap vanishes; noise is where temporal
    # prediction pays.)
    from clickhouse_build_spark.operators.avi import encode_avi_mjpeg

    frames = [RNG.integers(0, 256, (48, 64), dtype=np.uint8)] * 8
    p = encode_avi_pframe(frames, fps=2)
    m = encode_avi_mjpeg(frames, fps=2)
    assert len(p) < 0.55 * len(m)
