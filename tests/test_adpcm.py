"""IMA-ADPCM codec tests: bit-exact round-trip on the oracle content
shape, bounded loss on real signals, container structure, error paths.
No Spark needed."""

from __future__ import annotations

import numpy as np
import pytest

from clickhouse_build_spark.operators.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    decode_wav_adpcm,
    encode_wav_adpcm,
)

RNG = np.random.default_rng(31)


def test_tables_are_the_published_ima_tables():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))
    assert INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_block_constant_roundtrip_is_exact():
    """The oracle contract: one constant value per block round-trips
    bit-exactly (header carries sample 0; zero deltas stay zero at
    step index 0)."""
    vals = RNG.integers(-128, 128, 20, dtype=np.int16) * 256
    sig = np.repeat(vals, 4000)
    rate, dec = decode_wav_adpcm(encode_wav_adpcm(sig, 16000, 4000))
    assert rate == 16000
    assert np.array_equal(dec, sig)


def test_compression_ratio_is_real():
    sig = np.repeat(RNG.integers(-128, 128, 8, dtype=np.int16) * 256, 4000)
    enc = encode_wav_adpcm(sig, 16000, 4000)
    assert len(enc) < sig.nbytes // 3  # ~4:1 minus headers


def test_sine_snr_bound():
    t = np.arange(16000)
    sig = (8000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    rate, dec = decode_wav_adpcm(encode_wav_adpcm(sig, 16000))
    snr = 10 * np.log10(
        (sig.astype(float) ** 2).mean()
        / ((dec.astype(float) - sig) ** 2).mean()
    )
    assert snr > 25


def test_partial_final_block_and_odd_lengths():
    for n in (5003, 4000, 4001, 37):
        sig = (1000 * np.sin(np.arange(n) / 7)).astype(np.int16)
        rate, dec = decode_wav_adpcm(encode_wav_adpcm(sig, 8000, 4000))
        assert len(dec) == n


def test_container_structure():
    sig = np.zeros(100, dtype=np.int16)
    enc = encode_wav_adpcm(sig, 16000)
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE"
    assert b"fact" in enc and b"data" in enc
    # fmt tag 0x11 at the fmt chunk head
    i = enc.index(b"fmt ") + 8
    assert enc[i] == 0x11


def test_error_paths():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav_adpcm(b"\xff\xd8\xff\xe0")
    with pytest.raises(ValueError, match="int16"):
        encode_wav_adpcm(np.zeros(8, dtype=np.uint8), 16000)
    # an 8-bit PCM wav is NOT adpcm — format tag mismatch fails loudly
    from clickhouse_build_spark.operators.codecs import encode_wav_pcm8

    pcm = encode_wav_pcm8(np.zeros(64, dtype=np.uint8), 16000)
    with pytest.raises(ValueError, match="IMA ADPCM"):
        decode_wav_adpcm(pcm)
