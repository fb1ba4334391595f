"""Value pins for the fixture-only rows-only entry queries (VERDICT r04
ask #7): q24/q25/q31/q32/q37 are graded rows-only by the driver, so the
aggregates they emit are pinned here against expectations computed in
closed form (or by independent local replay) from the fixtures'
synthesis parameters — the Spark plumbing cannot silently drift without
one of these failing.

Expectation sources, per query:

* q24 — EXACT: the dirty fixture injects one labeled defect per ~2% of
  rows as a pure function of the row index (fixtures.row_meta); the
  per-check violation counts are recomputed locally from the same
  metadata function.
* q25 — closed form: clips are 0.8·sin(2πft) + 0.01·uniform noise, so
  rms ≈ sqrt(0.8²/2 + 0.01²/3) and zero crossings ≈ 2·f·T per clip;
  durations are exact integer sample counts.
* q31/q32 — EXACT: deterministic md5-keystream pixels / gradient Y4M
  frames; dimensions, byte totals and the luma histogram are recomputed
  with independent local numpy.
* q37 — closed form: the dominant rFFT bin of a windowless pure tone is
  the bin nearest f, so avg_dominant_hz tracks the mean synthesis
  frequency to within a fraction of a bin; a 0.57-rms tone has zero
  silence frames and zero full-scale samples.
"""

import hashlib
import math

import numpy as np
import pytest

import __spark_entry__ as entry
from drain3_spark import fixtures as FX
from drain3_spark.audio.synth import clip_params

SF = "/root/testdata/sf0.001"  # q24/q25/q31/q32/q37 ignore sf_dir


# --------------------------------------------------------------- q24

def test_q24_violation_counts_pin(spark):
    """Per-check violation counts == the defect injection schedule."""
    want: dict = {}
    for i in range(400):
        m = FX.row_meta(i, n_ds=7, dur_lo=200, dur_hi=600, dirty=True)
        v = FX.expected_violation(m)
        if v is not None:
            want[v[2]] = want.get(v[2], 0) + 1
    # 400 rows at ~2% defect rate: several (not necessarily all 8)
    # defect kinds land; the pin is the exact per-check count map
    assert sum(want.values()) > 0 and len(want) >= 4
    got = {r.check: r.n
           for r in entry.queries()["q24_audio_validation"](spark, SF).collect()}
    assert got == want


# --------------------------------------------------------------- q25

def test_q25_audio_feature_aggregates_pin(spark):
    row = entry.queries()["q25_audio_features"](spark, SF).collect()[0]
    assert row.n_clips == 200

    # exact expected durations / analytic rms and zero-crossing totals
    durs, zc_expect = [], 0.0
    for i in range(200):
        m = FX.row_meta(i, n_ds=7, dur_lo=200, dur_hi=600, dirty=False)
        n = m["sr_hz"] * m["dur_ms"] // 1000
        dur_s = n / m["sr_hz"]
        durs.append(dur_s)
        zc_expect += 2.0 * clip_params(m["clip_id"])["freq"] * dur_s
    assert abs(row.avg_dur - np.mean(durs)) <= 2e-4

    # rms of 0.8 sine + 0.01 uniform noise (codec quantization shifts
    # this by <0.1% at the guaranteed >=30 dB SNR)
    rms_analytic = math.sqrt(0.8 ** 2 / 2 + 0.01 ** 2 / 3)
    assert abs(row.avg_rms - rms_analytic) <= 0.005

    # sign changes of a strong tone: 2fT per clip within a few percent
    # (noise adds rare extra crossings near the zeros)
    assert abs(row.total_zc - zc_expect) / zc_expect <= 0.03


# --------------------------------------------------------------- q31

def _local_image(i: int, width=16, height=16) -> np.ndarray:
    npx = width * height * 3
    stream, k = b"", 0
    while len(stream) < npx:
        stream += hashlib.md5(f"img-{i}-{k}".encode()).digest()
        k += 1
    return np.frombuffer(stream[:npx], np.uint8).reshape(height, width, 3)


def test_q31_image_aggregates_pin(spark):
    row = entry.queries()["q31_image_features"](spark, SF).collect()[0]
    assert row.n_images == 200
    assert row.total_px == 200 * 16 * 16
    assert row.resized_total_bytes == 200 * 8 * 8 * 3
    # luma histogram bin 0 recomputed with independent local numpy over
    # the same md5 keystream; per-image fractions are dyadic (k/256) so
    # the double sum is exact and the rounded values must match exactly
    bin0 = 0.0
    for i in range(200):
        luma = _local_image(i).mean(axis=2).astype(np.uint8)
        bin0 += float(np.count_nonzero((luma >> 4) == 0)) / luma.size
    assert abs(row.hist_bin0 - round(bin0, 4)) <= 1e-9


# --------------------------------------------------------------- q32

def test_q32_video_aggregates_pin(spark):
    row = entry.queries()["q32_video_frames"](spark, SF).collect()[0]
    # every_nth=2 over 8 frames keeps frames {0,2,4,6} of all 50 videos
    assert row.n_frames_kept == 50 * 4
    assert row.n_videos == 50
    assert row.rgb_bytes == 50 * 4 * 16 * 12 * 3


# --------------------------------------------------------------- q37

def test_q37_spectral_aggregates_pin(spark):
    row = entry.queries()["q37_audio_spectral"](spark, SF).collect()[0]
    assert row.n_clips == 200

    # dominant bin of a pure tone = nearest rFFT bin to f; the mean over
    # 200 clips tracks the mean synthesis frequency within a fraction of
    # the widest bin (sr/n = 1000/dur_ms <= 5 Hz here)
    freqs = [clip_params(FX.row_meta(i, n_ds=7, dur_lo=200, dur_hi=600,
                                     dirty=False)["clip_id"])["freq"]
             for i in range(200)]
    assert abs(row.avg_dominant_hz - np.mean(freqs)) <= 2.0

    # a 0.57-rms tone has no sub-0.01-rms frames and no full-scale
    # samples (peak 0.81 << 0.999)
    assert row.avg_silence == 0.0
    assert row.n_clipped == 0
    # tones are spectrally flat-less: geometric/arithmetic power ratio
    # collapses toward 0 (white noise would push it toward 1)
    assert row.avg_flatness < 0.01


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
