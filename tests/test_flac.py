"""FLAC codec tests.

Round-trips through our own encoder must be BIT-EXACT (lossless codec:
equality is the oracle, not SNR).  The decoder features the encoder
never emits — verbatim/constant/LPC subframes, multi-partition Rice,
the escaped raw-bits partition, wasted bits — are exercised with
hand-built conformant streams assembled from the module's own bit
writer + CRC primitives.
"""

import struct

import numpy as np
import pytest

from drain3_spark.audio.flac import (_BitWriter, _crc8, _crc16, decode_flac,
                                     encode_flac, flac_header)


def _quant(x):
    return np.round(np.clip(np.asarray(x, dtype=np.float64), -1, 1)
                    * 32767.0).astype(np.int64)


def _sig(n, sr=8000, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return np.clip(0.5 * np.sin(2 * np.pi * 317 * t)
                   + 0.05 * rng.standard_normal(n), -1, 1).astype(np.float32)


# ------------------------------------------------------------ round-trips

@pytest.mark.parametrize("n,sr", [(1, 8000), (100, 8000), (4096, 16000),
                                  (4097, 16000), (12345, 44100)])
def test_flac_roundtrip_bit_exact(n, sr):
    x = _sig(n, sr)
    payload = encode_flac(x, sr)
    pcm, got_sr = decode_flac(payload)
    assert got_sr == sr
    assert np.array_equal(_quant(x), _quant(pcm))
    h_sr, total = flac_header(payload)
    assert (h_sr, total) == (sr, n)


def test_flac_roundtrip_hard_signals():
    # constant, alternating full-scale, ramp — the predictor orders'
    # best/worst cases
    for sig in (np.zeros(5000, dtype=np.float32),
                np.tile([1.0, -1.0], 2500).astype(np.float32),
                (np.arange(5000) % 2000 / 2000.0 - 0.5).astype(np.float32)):
        pcm, _ = decode_flac(encode_flac(sig, 16000))
        assert np.array_equal(_quant(sig), _quant(pcm))


def test_flac_rejects_malformed():
    for bad in (b"", b"fLaX" + b"\x00" * 40, b"\x00" * 10):
        with pytest.raises(ValueError):
            flac_header(bad)
    good = bytearray(encode_flac(_sig(600), 8000))
    # corrupt one frame-body byte: the frame CRC-16 must catch it
    good[-3] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(good))


# ------------------------------------- hand-built decoder feature streams

def _container(frames: bytes, sr: int, total: int) -> bytes:
    streaminfo = struct.pack(">HH", 4096, 4096) + b"\x00" * 6
    packed = (sr << 44) | (0 << 41) | (15 << 36) | total
    streaminfo += packed.to_bytes(8, "big") + b"\x00" * 16
    return (b"fLaC" + struct.pack(">BBH", 0x80, 0, len(streaminfo))
            + streaminfo + frames)


def _frame_header(bs: int, f_idx: int = 0, ss_code: int = 0x4) -> bytearray:
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0x7 << 4) | 0x0)
    hdr.append((0x0 << 4) | (ss_code << 1))
    hdr.append(f_idx)  # utf8-coded frame number < 0x80
    hdr += struct.pack(">H", bs - 1)
    hdr.append(_crc8(bytes(hdr)))
    return hdr


def _wrap_frame(hdr: bytearray, body: bytes) -> bytes:
    frame = bytes(hdr) + body
    return frame + struct.pack(">H", _crc16(frame))


def _zigzag(v: int) -> int:
    return (-v) * 2 - 1 if v < 0 else v * 2


def test_flac_decodes_constant_subframe():
    bs = 64
    w = _BitWriter()
    w.write(0, 1)
    w.write(0, 6)      # constant
    w.write(0, 1)
    w.write((-1234) & 0xFFFF, 16)
    payload = _container(_wrap_frame(_frame_header(bs), w.tobytes()), 8000, bs)
    pcm, _ = decode_flac(payload)
    assert np.array_equal(_quant(pcm), np.full(bs, -1234))


def test_flac_decodes_verbatim_subframe():
    rng = np.random.default_rng(5)
    samples = rng.integers(-32768, 32768, 48)
    w = _BitWriter()
    w.write(0, 1)
    w.write(1, 6)      # verbatim
    w.write(0, 1)
    for v in samples:
        w.write(int(v) & 0xFFFF, 16)
    payload = _container(_wrap_frame(_frame_header(48), w.tobytes()),
                         16000, 48)
    pcm, _ = decode_flac(payload)
    assert np.array_equal(_quant(pcm), samples)


def test_flac_decodes_lpc_subframe():
    # order-2 LPC with coefficients [2, -1], shift 1: pred = (2a - b) >> 1
    rng = np.random.default_rng(9)
    samples = np.cumsum(rng.integers(-50, 51, 40)).astype(np.int64)
    order, coefs, shift = 2, [2, -1], 1
    res = [int(samples[i]
               - ((coefs[0] * samples[i - 1] + coefs[1] * samples[i - 2])
                  >> shift)) for i in range(order, len(samples))]
    w = _BitWriter()
    w.write(0, 1)
    w.write(32 | (order - 1), 6)   # LPC, order 2
    w.write(0, 1)
    for v in samples[:order]:
        w.write(int(v) & 0xFFFF, 16)
    w.write(4 - 1, 4)              # precision 4 bits
    w.write(shift, 5)              # shift (signed 5-bit, positive)
    for c in coefs:
        w.write(c & 0xF, 4)
    w.write(0, 2)                  # rice method 0
    w.write(0, 4)                  # partition order 0
    k = 6
    w.write(k, 4)
    for v in res:
        u = _zigzag(v)
        w.write_unary(u >> k)
        w.write(u & ((1 << k) - 1), k)
    payload = _container(_wrap_frame(_frame_header(len(samples)),
                                     w.tobytes()), 8000, len(samples))
    pcm, _ = decode_flac(payload)
    assert np.array_equal(_quant(pcm), samples)


def test_flac_decodes_multi_partition_and_escape():
    # fixed order 0, partition order 1: first partition Rice(3),
    # second partition ESCAPED raw 9-bit residuals
    bs = 32
    rng = np.random.default_rng(3)
    samples = rng.integers(-200, 200, bs)
    w = _BitWriter()
    w.write(0, 1)
    w.write(8, 6)                  # fixed, order 0
    w.write(0, 1)
    w.write(0, 2)                  # rice method 0 (4-bit params)
    w.write(1, 4)                  # partition order 1 -> 2 partitions
    k = 3
    w.write(k, 4)
    for v in samples[:bs // 2]:
        u = _zigzag(int(v))
        w.write_unary(u >> k)
        w.write(u & ((1 << k) - 1), k)
    w.write(0xF, 4)                # escape
    w.write(9, 5)                  # raw 9-bit signed residuals
    for v in samples[bs // 2:]:
        w.write(int(v) & 0x1FF, 9)
    payload = _container(_wrap_frame(_frame_header(bs), w.tobytes()),
                         22050, bs)
    pcm, _ = decode_flac(payload)
    assert np.array_equal(_quant(pcm), samples)


def test_flac_decodes_wasted_bits():
    # samples all divisible by 4 -> 2 wasted bits, stored >> 2
    samples = np.arange(-40, 40, 2, dtype=np.int64) * 4
    bs = len(samples)
    w = _BitWriter()
    w.write(0, 1)
    w.write(8, 6)                  # fixed, order 0
    w.write(1, 1)                  # wasted-bits flag
    w.write_unary(1)               # unary(1) -> wasted = 2
    stored = samples >> 2
    w.write(0, 2)
    w.write(0, 4)
    k = 4
    w.write(k, 4)
    for v in stored:
        u = _zigzag(int(v))
        w.write_unary(u >> k)
        w.write(u & ((1 << k) - 1), k)
    payload = _container(_wrap_frame(_frame_header(bs), w.tobytes()),
                         8000, bs)
    pcm, _ = decode_flac(payload)
    assert np.array_equal(_quant(pcm), samples)


# ------------------------------------------------------------- dispatch

def test_flac_through_codec_dispatch():
    from drain3_spark.audio.codecs import decode, encode
    x = _sig(3000, 22050)
    payload = encode(x, "flac", sr_hz=22050)
    got = decode(payload, "flac")
    assert np.array_equal(_quant(x), _quant(got))


def test_flac_non_16bit_amplitude_scaling():
    """External 8- and 24-bit mono streams decode at the CORRECT
    amplitude: full scale is 2^(bits-1)-1 of the frame's actual sample
    size, not a hardcoded /32767 (which left 24-bit ~256x hot)."""
    bs = 64
    # 24-bit constant subframe (ss_code 6)
    w = _BitWriter()
    w.write(0, 1)
    w.write(0, 6)
    w.write(0, 1)
    w.write((-1234567) & 0xFFFFFF, 24)
    payload = _container(
        _wrap_frame(_frame_header(bs, ss_code=0x6), w.tobytes()), 8000, bs)
    pcm, _ = decode_flac(payload)
    assert np.allclose(pcm, -1234567 / (2 ** 23 - 1), atol=1e-9)

    # 8-bit constant subframe (ss_code 1)
    w = _BitWriter()
    w.write(0, 1)
    w.write(0, 6)
    w.write(0, 1)
    w.write(100 & 0xFF, 8)
    payload = _container(
        _wrap_frame(_frame_header(bs, ss_code=0x1), w.tobytes()), 8000, bs)
    pcm, _ = decode_flac(payload)
    assert np.allclose(pcm, 100 / 127.0, atol=1e-9)


def test_flac_rejects_mid_stream_depth_change():
    """A stream whose frames disagree on sample size is malformed —
    one full-scale factor applies to the whole stream."""
    import pytest
    bs = 64
    frames = b""
    for i, ss in enumerate((0x4, 0x6)):
        w = _BitWriter()
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(5, 16 if ss == 0x4 else 24)
        frames += _wrap_frame(_frame_header(bs, f_idx=i, ss_code=ss),
                              w.tobytes())
    payload = _container(frames, 8000, 2 * bs)
    with pytest.raises(ValueError, match="sample size changed"):
        decode_flac(payload)
