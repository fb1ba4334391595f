"""YIN pitch tracking: synthesized tones recovered to <0.1%, harmonic
stacks resolve to the fundamental (no octave error), noise/silence
unvoiced, and the Spark operator matches the local kernel."""

import numpy as np

from drain3_spark import fixtures as FX
from drain3_spark.audio.codecs import decode
from drain3_spark.pipeline.audio_pitch import pitch_kernel, pitch_stats

FS = 16000


def _tone(f, sec=2.0, fs=FS, amp=0.4):
    return amp * np.sin(2 * np.pi * f * np.arange(int(sec * fs)) / fs)


def test_pure_tones_recovered():
    for f in (80.0, 110.0, 220.0, 330.5, 440.0, 587.33):
        nf, vr, med, lo, hi = pitch_kernel(_tone(f), FS)
        assert vr == 1.0, f
        assert abs(med - f) / f < 1e-3, (f, med)
        assert hi - lo < 0.2  # stable across frames


def test_harmonic_stack_finds_fundamental():
    """A 200 Hz tone with 4 harmonics must read 200, not an octave."""
    t = np.arange(2 * FS) / FS
    x = sum((0.3 / k) * np.sin(2 * np.pi * 200 * k * t) for k in range(1, 5))
    _, vr, med, lo, hi = pitch_kernel(x, FS)
    assert vr == 1.0 and abs(med - 200.0) < 1.0, (med, lo, hi)


def test_unvoiced_and_degenerate():
    rng = np.random.default_rng(3)
    assert pitch_kernel(0.2 * rng.standard_normal(FS), FS)[1] == 0.0
    assert pitch_kernel(np.zeros(FS), FS)[1] == 0.0
    assert pitch_kernel(np.zeros(10), FS) == (0, 0.0, None, None, None)


def test_two_pitch_program_spans_both():
    x = np.concatenate([_tone(150.0, 1.0), _tone(300.0, 1.0)])
    nf, vr, med, lo, hi = pitch_kernel(x, FS)
    assert vr > 0.9
    assert abs(lo - 150.0) < 1.0 and abs(hi - 300.0) < 1.0


def test_sample_rate_independence():
    for fs in (8000, 16000, 44100):
        _, vr, med, _, _ = pitch_kernel(_tone(180.0, 2.0, fs), fs)
        assert vr == 1.0 and abs(med - 180.0) < 0.5, (fs, med)


def test_pitch_spark_matches_kernel(spark):
    clips = FX.gen_clips(spark, 30, dirty=True)
    got = {r.clip_id: r for r in pitch_stats(clips)
           .dropDuplicates(["clip_id"]).collect()}
    seen = set()
    for i in range(30):
        m = FX.row_meta(i, dirty=True)
        if m["clip_id"] in seen:
            continue
        seen.add(m["clip_id"])
        row = FX._synth_row(m)[0]
        try:
            pcm = decode(bytes(row[1]), m["codec"])
        except Exception:
            assert got[m["clip_id"]].voiced_ratio == 0.0
            continue
        want = pitch_kernel(pcm, row[2])
        r = got[m["clip_id"]]
        assert (r.n_frames, r.voiced_ratio, r.f0_median_hz, r.f0_min_hz,
                r.f0_max_hz) == want, m["clip_id"]


def test_pitch_undecodable_reports_zero(spark):
    df = spark.createDataFrame(
        [("junk", bytearray(b"\x00\x01"), FS, 100, "flac")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string")
    r = pitch_stats(df).collect()[0]
    assert (r.voiced_ratio, r.f0_median_hz) == (0.0, None)


def test_silent_frames_stay_unvoiced_at_48k():
    """Digital-silence frames have d == 0 everywhere; the paper's
    d' = 1 convention must hold, else they read as a perfect dip at
    tau_min and silence gets voiced at exactly f_hi whenever sr/f_hi
    divides (48000/600): a tone+silence clip used to report ~0.99
    voiced with a bogus 600 Hz f0_max."""
    fs = 48000
    t = np.arange(fs) / fs
    x = np.concatenate([0.4 * np.sin(2 * np.pi * 200 * t), np.zeros(fs)])
    nf, vr, med, lo, hi = pitch_kernel(x, fs)
    assert abs(vr - 0.5) < 0.02, vr
    assert abs(med - 200.0) < 0.5 and abs(hi - 200.0) < 0.5
    assert pitch_kernel(np.zeros(fs), fs)[1] == 0.0
