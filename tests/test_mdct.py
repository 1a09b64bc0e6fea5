"""MDCT transform-audio codec (operators/mdct.py): perfect
reconstruction, near-lossless int16 exactness at the default step,
per-band allocation compression, lossy bounds, container errors."""

import numpy as np
import pytest

from clickhouse_build_spark.operators.mdct import (
    MDCT_N,
    STEP,
    _B,
    decode_mdct,
    encode_mdct,
)

RNG = np.random.default_rng(17)


def test_filterbank_is_perfect_reconstruction():
    # TDAC identity in float: encode with an (effectively) unquantized
    # step and the synthesis must reproduce the input to fp noise
    x = RNG.standard_normal(5000) * 1000
    xi = np.round(x).astype(np.int16)
    p = encode_mdct(xi, 16000, step=2.0**-20)
    _, back = decode_mdct(p)
    assert (back == xi).all()


def test_int16_round_trip_exact_at_default_step():
    # adversarial full-range noise, odd lengths, extremes
    for n in (1, 255, 256, 4097, 20000):
        x = RNG.integers(-32768, 32768, n, dtype=np.int16)
        x[:2] = (-32768, 32767)[: min(n, 2)]
        rate, back = decode_mdct(encode_mdct(x, 16000))
        assert rate == 16000
        assert back.shape == x.shape
        assert (back == x).all(), n


def test_band_allocation_compresses_tonal_and_constant_content():
    vals = ((RNG.integers(0, 256, 20) - 128) * 256).astype(np.int16)
    const = np.repeat(vals, 4000)
    p = encode_mdct(const, 16000)
    assert len(p) < 0.35 * 2 * len(const)  # >~3x vs raw int16
    t = np.arange(32000)
    tone = (8000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    pt = encode_mdct(tone, 16000)
    assert len(pt) < 2 * len(tone)
    _, bt = decode_mdct(pt)
    assert (bt == tone).all()


def test_coarse_step_is_lossy_but_bounded():
    x = RNG.integers(-32768, 32768, 16000, dtype=np.int16)
    p = encode_mdct(x, 16000, step=64.0)
    _, back = decode_mdct(p)
    err = np.abs(back.astype(int) - x.astype(int)).max()
    assert 0 < err < 64 * np.sqrt(2 * MDCT_N)  # quantization-bound drift
    assert len(p) < 2 * len(x)  # and it actually saves bits on noise


def test_container_error_paths():
    x = RNG.integers(-2000, 2000, 3000, dtype=np.int16)
    p = encode_mdct(x, 16000)
    with pytest.raises(ValueError, match="MDA1"):
        decode_mdct(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="truncated"):
        decode_mdct(p[: len(p) // 2])
    with pytest.raises(ValueError):
        encode_mdct(x.astype(np.float64), 16000)


def test_basis_rows_are_orthogonal_enough():
    # sanity on the windowed basis: synthesis of analysis ~ identity
    # through overlap-add is covered above; here pin the shape
    assert _B.shape == (MDCT_N, 2 * MDCT_N)
    assert STEP <= 1 / 32  # the int16-exactness operating point
