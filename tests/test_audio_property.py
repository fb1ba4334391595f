"""Property-based laws for the round-7 DSP kernels (hypothesis):

* loudness is gain-EQUIVARIANT: lufs(g·x) = lufs(x) + 20·log10(g)
  exactly, as long as the shift keeps gated blocks clear of the
  −70 LUFS absolute gate (the relative gate shifts with the signal);
* true peak is gain-equivariant the same way (pure linearity);
* YIN pitch is gain-INVARIANT: the normalized difference function
  cancels scale, so f0 and voicing are bit-identical under gain;
* band-limited signals survive a sinc up/down round trip.

These are laws of the math, not pins of chosen constants — hypothesis
searches the signal space for violations.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from drain3_spark.pipeline.audio_loudness import lufs_kernel, true_peak_dbfs
from drain3_spark.pipeline.audio_pitch import pitch_kernel
from drain3_spark.pipeline.audio_sim import sinc_resample_kernel

FS = 16000


def _program(seed: int, n_sec: float = 2.0) -> np.ndarray:
    """Speech-shaped random program: AM multi-tone + noise, amplitude
    kept well above the gates so gain shifts stay in the linear
    regime of every law under test."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(n_sec * FS)) / FS
    x = np.zeros_like(t)
    for _ in range(3):
        f = rng.uniform(100, 2000)
        x += rng.uniform(0.2, 0.5) * np.sin(2 * np.pi * f * t)
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(1, 5) * t)
    x += 0.02 * rng.standard_normal(len(t))
    return 0.3 * x / np.max(np.abs(x))


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10**6), gain_db=st.floats(-12.0, 6.0))
def test_lufs_gain_equivariance(seed, gain_db):
    x = _program(seed)
    g = 10.0 ** (gain_db / 20.0)
    base = lufs_kernel(x, FS)
    scaled = lufs_kernel(g * x, FS)
    assert abs((scaled[0] - base[0]) - gain_db) < 1e-6
    assert abs((scaled[1] - base[1]) - gain_db) < 1e-6
    assert scaled[2:] == base[2:]  # same blocks survive the gates


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10**6), gain_db=st.floats(-20.0, 6.0))
def test_true_peak_gain_equivariance(seed, gain_db):
    x = _program(seed)
    g = 10.0 ** (gain_db / 20.0)
    assert abs((true_peak_dbfs(g * x) - true_peak_dbfs(x))
               - gain_db) < 1e-6


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10**6), gain_db=st.floats(-20.0, 12.0))
def test_pitch_gain_invariance(seed, gain_db):
    """The cumulative-mean normalization cancels scale exactly."""
    x = _program(seed)
    g = 10.0 ** (gain_db / 20.0)
    base = pitch_kernel(x, FS)
    scaled = pitch_kernel(g * x, FS)
    assert scaled[0] == base[0] and scaled[1] == base[1]
    if base[2] is not None:
        assert abs(scaled[2] - base[2]) < 1e-6


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10**6))
def test_sinc_roundtrip_preserves_bandlimited_content(seed):
    """16k -> 32k -> 16k on a signal band-limited well under 8 kHz:
    the round trip returns the original at high SNR (edges excluded —
    the kernel clamps at clip bounds)."""
    x = _program(seed)
    up = sinc_resample_kernel(x, FS, 2 * FS).astype(np.float64)
    back = sinc_resample_kernel(up, 2 * FS, FS).astype(np.float64)
    m = min(len(back), len(x))
    a, b = x[200:m - 200], back[200:m - 200]
    snr = 10 * np.log10(np.mean(a ** 2) / np.mean((a - b) ** 2))
    assert snr > 40.0, snr
