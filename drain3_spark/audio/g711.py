"""Exact ITU-T G.711 segmented companding (the telephony wire format).

The package's ``mulaw``/``alaw`` codecs use the textbook CONTINUOUS
companding formulas — exact inverses of each other, fine for the
synthetic corpus, but NOT bit-compatible with real G.711 bytes: the
standard quantizes with 8 piecewise-linear SEGMENTS (sign + 3-bit
segment + 4-bit mantissa), so a real telephony corpus (WAV fmt tags
6/7, RTP PCMU/PCMA) decoded with the continuous formula is off by up
to half a segment step.  ``g711_mulaw`` / ``g711_alaw`` are the
interop-exact variants, implemented straight from the G.711 tables:

* **mu-law encode**: bias +33 on the 14-bit lattice, clamp to 8158,
  segment = leading-bit position of the biased magnitude (seg-0 band
  33..63), mantissa = the 4 bits below it, byte = ~(sign | seg << 4 |
  mantissa) — so positive digital zero is the spec's 0xFF.  Decode is
  the exact interval midpoint ((2·mantissa + 33) << seg) − 33; max
  decoded magnitude 8031 on the 14-bit (+-8159) lattice.
* **A-law encode**: clamp to 4095 on the 13-bit lattice, segment from
  the magnitude's leading bit (segments 0 and 1 share a step),
  byte = (sign | seg << 4 | mantissa) XOR 0x55 (the spec's
  alternate-bit inversion).  Decode midpoint max 4032.

Both decode via a 256-entry LUT built once from the spec algorithm
(same table-gather shape as the continuous codecs); encode is fully
vectorized (no per-sample Python).  Float contract matches the rest
of :mod:`drain3_spark.audio.codecs`: [-1, 1] float32 <-> the codec's
integer lattice.

Self-consistency pins (tests/test_g711.py): encode(decode(byte)) ==
byte for all 256 codes of both laws (the G.711 decoder output is each
quantization interval's midpoint, so re-encoding must be the
identity), spec-derived extrema (8031 / 4032), monotonicity, and
round-trip SNR on program material comfortably above the 30 dB gate.
"""

from __future__ import annotations

import numpy as np

_MU_BIAS = 33     # bias on the 14-bit (+-8159) lattice
_MU_CLIP = 8158   # clamp so the biased magnitude stays < 8192 (seg 7)


def encode_mulaw_g711(pcm: np.ndarray) -> bytes:
    """float32 [-1,1] -> G.711 mu-law bytes (sign|seg|mantissa, all
    bits inverted; positive zero is the spec's 0xFF)."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    pcm14 = np.round(x * 8159.0).astype(np.int32)
    sign = np.where(pcm14 < 0, 0x80, 0x00).astype(np.int32)
    mag = np.minimum(np.abs(pcm14), _MU_CLIP) + _MU_BIAS  # 33..8191
    # segment = leading-bit position - 5 (biased seg-0 band is 33..63)
    seg = np.zeros(mag.shape, dtype=np.int32)
    for s in range(1, 8):
        seg[mag >= (0x40 << (s - 1))] = s
    mant = (mag >> (seg + 1)) & 0x0F
    byte = ~(sign | (seg << 4) | mant) & 0xFF
    return byte.astype(np.uint8).tobytes()


def _mu_decode_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32)
    u = ~codes & 0xFF
    sign = u & 0x80
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    # interval midpoint on the 14-bit lattice; seg-7 mant-15 = 8031
    mag = (((mant << 1) + _MU_BIAS) << seg) - _MU_BIAS
    val = np.where(sign != 0, -mag, mag)
    return (val / 8159.0).astype(np.float32)


def decode_mulaw_g711(data: bytes) -> np.ndarray:
    return _MU_LUT[np.frombuffer(data, dtype=np.uint8)]


def encode_alaw_g711(pcm: np.ndarray) -> bytes:
    """float32 [-1,1] -> G.711 A-law bytes (sign|seg|mantissa XOR
    0x55)."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    pcm13 = np.round(x * 4096.0).astype(np.int32)
    sign = np.where(pcm13 >= 0, 0x80, 0x00).astype(np.int32)
    # the spec takes the one's complement (-pcm - 1) of negative
    # samples, not the absolute value — segment lower-edge negatives
    # land one quantization interval differently otherwise
    mag = np.minimum(np.where(pcm13 >= 0, pcm13, -pcm13 - 1), 4095)
    seg = np.zeros(mag.shape, dtype=np.int32)
    for s in range(1, 8):
        seg[mag >= (0x20 << (s - 1))] = s
    mant = np.where(seg < 2, (mag >> 1) & 0x0F,
                    (mag >> seg) & 0x0F)
    byte = (sign | (seg << 4) | mant) ^ 0x55
    return byte.astype(np.uint8).tobytes()


def _a_decode_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32) ^ 0x55
    sign = codes & 0x80
    seg = (codes >> 4) & 0x07
    mant = codes & 0x0F
    mag = np.where(seg == 0, (mant << 1) + 1,
                   np.where(seg == 1, (mant << 1) + 33,
                            (((mant << 1) + 33) << (seg - 1))))
    val = np.where(sign != 0, mag, -mag)
    return (val / 4096.0).astype(np.float32)


def decode_alaw_g711(data: bytes) -> np.ndarray:
    return _A_LUT[np.frombuffer(data, dtype=np.uint8)]


_MU_LUT = _mu_decode_table()
_A_LUT = _a_decode_table()
