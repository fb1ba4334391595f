"""Deterministic per-clip reference audio.

Every clip's PCM is a pure function of its ``clip_id`` (sine + small
uniform noise, parameters from a sha1 digest), so the decode check
regenerates the reference signal on the executor instead of reading a
reference payload table (FIXTURES.md T2 note).
"""

from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np

SR_CHOICES = (8000, 16000, 22050, 44100, 48000)
SR_WEIGHTS = (30, 30, 15, 15, 10)          # cumulative percent buckets
CODEC_CHOICES = ("pcm_s16le", "mulaw", "alaw", "pcm_f32le")
CODEC_WEIGHTS = (70, 15, 10, 5)            # intentionally skewed (C11)


def _pick(weights, choices, bucket: int):
    acc = 0
    for w, c in zip(weights, choices):
        acc += w
        if bucket < acc:
            return c
    return choices[-1]


def clip_params(clip_id: str, dur_lo: int = 200, dur_hi: int = 3000) -> Dict:
    """Deterministic generation parameters for a clip id (FIXTURES.md T1)."""
    h = int.from_bytes(hashlib.sha1(clip_id.encode()).digest()[:8], "big")
    return {
        "h": h,
        "freq": 100 + (h % 900),
        "sr_hz": _pick(SR_WEIGHTS, SR_CHOICES, (h >> 16) % 100),
        "dur_ms": dur_lo + ((h >> 8) % max(dur_hi - dur_lo, 1)),
        "codec": _pick(CODEC_WEIGHTS, CODEC_CHOICES, (h >> 24) % 100),
    }


def reference_pcm(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Regenerable float32 reference signal for a clip."""
    p = clip_params(clip_id)
    n = max(int(sr_hz) * int(dur_ms) // 1000, 1)
    t = np.arange(n, dtype=np.float64) / float(sr_hz)
    rng = np.random.default_rng(p["h"] & 0xFFFFFFFF)
    sig = 0.8 * np.sin(2.0 * np.pi * p["freq"] * t) \
        + 0.01 * rng.uniform(-1.0, 1.0, n)
    return sig.astype(np.float32)
