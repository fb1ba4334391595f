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


def seeded_rng(seed: int) -> np.ndarray:
    """``np.random.Generator(np.random.PCG64(seed))`` — the SAME
    bit-exact stream as ``np.random.default_rng(seed)`` (default_rng
    wraps PCG64 for integer seeds) at half the construction cost
    (~14 us vs ~29 us; the ctor runs once per synthesized/validated
    clip, millions of times per bench pass)."""
    return np.random.Generator(np.random.PCG64(seed))


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
    rng = seeded_rng(p["h"] & 0xFFFFFFFF)
    sig = 0.8 * np.sin(2.0 * np.pi * p["freq"] * t) \
        + 0.01 * rng.uniform(-1.0, 1.0, n)
    return sig.astype(np.float32)


# 32-note geometric scale, 250..3300 Hz — adjacent notes ~8.7% apart,
# > one 15.625-Hz STFT bin everywhere (21 Hz at the bottom), so every
# note lands on its own constellation frequency bin (audio_fp.py);
# 5 bits/segment keeps note-bigram collisions between DIFFERENT
# melodies rare enough that an excerpt's vote count separates cleanly
# from the best accidental alignment
MELODY_SCALE = tuple(250.0 * (3300.0 / 250.0) ** (k / 31.0)
                     for k in range(32))


def melody_pcm(clip_id: str, sr_hz: int, dur_ms: int,
               seg_ms: int = 160) -> np.ndarray:
    """Regenerable float32 MELODY for a clip: a sequence of ``seg_ms``
    tone segments whose notes come from the sha1 keystream of the id
    (5 bits per segment into :data:`MELODY_SCALE`), each with a 0.25×
    second harmonic and 5 ms raised-cosine fades, plus a small seeded
    noise floor.

    Unlike :func:`reference_pcm` (one stationary tone), a melody has
    TIME-FREQUENCY STRUCTURE — distinct spectral peaks at distinct
    times — which is what constellation fingerprinting hashes.  Pure
    function of (clip_id, sr_hz, dur_ms), so tests and value pins can
    replay any clip or excerpt locally."""
    n = max(int(sr_hz) * int(dur_ms) // 1000, 1)
    h = int.from_bytes(hashlib.sha1(clip_id.encode()).digest()[:8], "big")
    # note keystream: sha1(id|k) bytes & 0x1F, extended as needed
    nseg = (dur_ms + seg_ms - 1) // seg_ms
    notes = []
    k = 0
    while len(notes) < nseg:
        d = hashlib.sha1(f"{clip_id}|mel{k}".encode()).digest()
        notes.extend(byte & 0x1F for byte in d)
        k += 1
    seg_n = max(int(sr_hz) * seg_ms // 1000, 1)
    fade_n = max(int(sr_hz) * 5 // 1000, 1)
    ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(fade_n) / fade_n)
    sig = np.zeros(n, dtype=np.float64)
    t = np.arange(n, dtype=np.float64) / float(sr_hz)
    for s in range(nseg):
        lo, hi = s * seg_n, min((s + 1) * seg_n, n)
        if lo >= n:
            break
        f = MELODY_SCALE[notes[s]]
        seg = 0.55 * np.sin(2.0 * np.pi * f * t[lo:hi])
        if 2.0 * f < 0.45 * sr_hz:   # skip harmonics that would alias
            seg = seg + 0.15 * np.sin(2.0 * np.pi * 2.0 * f * t[lo:hi])
        m = hi - lo
        if m > 2 * fade_n:
            seg[:fade_n] *= ramp
            seg[m - fade_n:] *= ramp[::-1]
        sig[lo:hi] = seg
    rng = seeded_rng(h & 0xFFFFFFFF ^ 0xFACEFEED)
    sig += 0.004 * rng.uniform(-1.0, 1.0, n)
    return sig.astype(np.float32)
