"""Audio quality scoring: Spark operator == local kernel, and the
composite score separates corrupt payloads from clean ones."""

import numpy as np

from drain3_spark import fixtures as FX
from drain3_spark.audio.codecs import decode
from drain3_spark.pipeline.audio_quality import audio_quality, quality_kernel


def test_quality_spark_matches_kernel(spark):
    clips = FX.gen_clips(spark, 40, dirty=True)
    got = {r.clip_id: r for r in audio_quality(clips)
           .dropDuplicates(["clip_id"]).collect()}
    seen = set()
    for i in range(40):
        m = FX.row_meta(i, dirty=True)
        if m["clip_id"] in seen:
            continue
        seen.add(m["clip_id"])
        row = FX._synth_row(m)[0]
        pcm = decode(bytes(row[1]), m["codec"]).astype(np.float64)
        want = quality_kernel(pcm, row[2])
        r = got[m["clip_id"]]
        have = (r.peak_dbfs, r.rms_dbfs, r.est_snr_db, r.clipping_ratio,
                r.silence_ratio, r.flatness, r.quality_score)
        assert have == want, m["clip_id"]


def test_quality_separates_corrupt_from_clean(spark):
    """Every corrupt-bytes defect scores < 0.7; every other clip in the
    dirty corpus scores >= 0.7 (the q47 n_low threshold)."""
    n = 500
    corrupt = {FX.row_meta(i, dirty=True)["clip_id"] for i in range(n)
               if FX.row_meta(i, dirty=True)["defect"] == "corrupt_bytes"}
    assert corrupt, "fixture must plant at least one corrupt clip"
    rows = audio_quality(FX.gen_clips(spark, n, dirty=True)).collect()
    for r in rows:
        if r.clip_id in corrupt:
            assert r.quality_score < 0.7, r
        else:
            assert r.quality_score >= 0.7, r


def test_quality_padded_clip_has_high_snr_and_silence():
    """A clip with leading/trailing digital silence shows a high decile
    SNR (the quiet frames ARE the noise floor) and a nonzero
    silence_ratio."""
    from drain3_spark.audio.synth import reference_pcm
    m = FX.row_meta(3, dur_lo=400, dur_hi=800)
    sr = m["sr_hz"]
    lead, tail = FX.pad_ms(m)
    pcm = reference_pcm(m["clip_id"], sr, m["dur_ms"])
    padded = np.concatenate([np.zeros(sr * lead // 1000), pcm,
                             np.zeros(sr * tail // 1000)])
    (_pk, _rms, snr, clip_r, sil, flat, score) = quality_kernel(padded, sr)
    assert snr >= 40.0
    assert sil > 0.05
    assert clip_r == 0.0 and flat < 0.01 and score >= 0.7


def test_quality_undecodable_scores_zero(spark):
    clips = spark.createDataFrame(
        [("bad-1", bytearray(b"\x01\x02\x03"), 16000, 100, "pcm_f32le",
          "", "2026-08-01")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string, ds string")
    r = audio_quality(clips).collect()[0]
    assert r.quality_score == 0.0 and r.flatness is None
