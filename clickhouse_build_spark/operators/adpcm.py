"""IMA ADPCM audio codec (WAV format tag 0x11) in pure python/numpy.

The compressed-audio analogue of the baseline-JPEG work: IMA/DVI ADPCM
is a genuine, standardized compressed audio format (4 bits/sample for
16-bit PCM — 4:1) whose entire codec is integer shift/add arithmetic
over two public tables, so it needs no native libraries. With this, the
media surface covers a real compressed format for every modality —
images (baseline JPEG), audio (IMA ADPCM), video (Motion-JPEG AVI) —
joined in round 7 by the MDCT transform coder (``operators/mdct.py``);
the remaining `NotImplementedError` seam is bitstream compatibility
(H.264 CABAC, AAC entropy + psychoacoustics).

Container: standard WAVE with wFormatTag=0x11, the 2-byte fmt extension
carrying samples-per-block, a `fact` chunk with the true sample count,
and self-contained blocks — each starts with a (predictor int16, step
index uint8, reserved) header followed by packed nibbles (low nibble
first). The decoder walks fmt/fact/data like codecs.decode_wav_pcm8
and accepts any conforming mono stream.

Exactness contract (what makes the format oracle-checkable): ADPCM is
lossy in general, but a block whose samples are ALL EQUAL round-trips
bit-exactly — the block header stores sample 0 verbatim, every
subsequent delta is 0, nibble 0 with step index 0 adds ``step >> 3 =
7 >> 3 = 0``, and the index stays clamped at 0. The media corpus's
adpcm rows use exactly that shape (one constant md5-seeded value per
250 ms window, one window per block), so decoded window energies are
exact SQL expressions; lossy behaviour on arbitrary signals is
pytest-bounded instead (tests/test_adpcm.py).
"""

from __future__ import annotations

import struct

import numpy as np

# Public IMA/DVI ADPCM tables (IMA ADPCM Reference, 1992).
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _decode_nibble(nibble: int, predictor: int, index: int) -> tuple[int, int]:
    step = STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = _clamp16(
        predictor - diff if nibble & 8 else predictor + diff
    )
    index = index + INDEX_TABLE[nibble & 7]
    return predictor, 0 if index < 0 else (88 if index > 88 else index)


def _encode_sample(sample: int, predictor: int, index: int) -> int:
    """Quantize one 16-bit sample against the running predictor → the
    4-bit nibble (standard IMA successive-approximation)."""
    step = STEP_TABLE[index]
    diff = sample - predictor
    nibble = 8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 4000
) -> bytes:
    """Encode 1-D int16 samples as a mono IMA-ADPCM WAV."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav_adpcm expects a 1-D int16 array")
    if samples_per_block < 2:
        raise ValueError("samples_per_block must be >= 2")
    nib_bytes = (samples_per_block - 1 + 1) // 2
    block_align = 4 + nib_bytes
    blocks = []
    for lo in range(0, len(samples), samples_per_block):
        chunk = samples[lo : lo + samples_per_block]
        predictor, index = int(chunk[0]), 0
        nibbles = []
        for s in chunk[1:]:
            n = _encode_sample(int(s), predictor, index)
            predictor, index = _decode_nibble(n, predictor, index)
            nibbles.append(n)
        # short/odd tails pad with nibble 0 to the fixed block size
        nibbles += [0] * (2 * nib_bytes - len(nibbles))
        packed = bytes(
            nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
        )
        blocks.append(struct.pack("<hBB", int(chunk[0]), 0, 0) + packed)
    data = b"".join(blocks)
    byte_rate = sample_rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2,
        samples_per_block,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 12 + 8 + len(data))
        + b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, len(samples))
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_adpcm(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono IMA-ADPCM WAV → (sample_rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, spb, block_align, total = 12, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if tag == b"fmt ":
            code, channels, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
            if (code, channels, bits) != (0x11, 1, 4):
                raise ValueError("only mono 4-bit IMA ADPCM supported")
            (spb,) = struct.unpack_from("<H", payload, body + 18)
        elif tag == b"fact":
            (total,) = struct.unpack_from("<I", payload, body)
        elif tag == b"data":
            if rate is None or spb is None:
                raise ValueError("WAV data chunk precedes fmt")
            out = np.empty(
                ((size + block_align - 1) // block_align) * spb, dtype=np.int16
            )
            n = 0
            for blo in range(body, body + size, block_align):
                predictor, index, _ = struct.unpack_from("<hBB", payload, blo)
                out[n] = predictor
                n += 1
                emitted = 1
                for b in payload[blo + 4 : blo + block_align]:
                    for nib in (b & 0x0F, b >> 4):
                        if emitted >= spb:
                            break
                        predictor, index = _decode_nibble(nib, predictor, index)
                        out[n] = predictor
                        n += 1
                        emitted += 1
            out = out[:n]
            return rate, out[:total] if total is not None else out
        pos = body + size + (size & 1)
    raise ValueError("WAV missing data chunk")
