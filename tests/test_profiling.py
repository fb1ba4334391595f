"""EngineProfiler (A17): section timing + in-job Observation counters
matching known fixture counts (reference drain3/simple_profiler.py)."""

from drain3_spark import fixtures as FX
from drain3_spark.profiling import EngineProfiler
from drain3_spark.validation.runner import ValidationConfig, ValidationEngine

N = 300


def test_profiler_sections_and_counters(spark):
    clips = FX.gen_clips(spark, N, dirty=True, dur_lo=200, dur_hi=1000).cache()
    ref = FX.gen_transcripts_ref(spark, N, dirty=True, dur_lo=200, dur_hi=1000)
    prof = EngineProfiler()
    engine = ValidationEngine(ValidationConfig(expected_schema=FX.CLIPS_SCHEMA))
    with prof.enclosing():
        report = engine.validate(clips, ref, profiler=prof)
    rows = {r[0]: r for r in prof.report_rows()}
    # (section, took_sec, took_pct, samples, ms_per_1k, hz)
    assert {"checks_jvm", "audio_decode", "drift_cube", "drift_stats",
            "schema_check"} <= set(rows)
    # in-job Observation counters: JVM + audio violation rows == total
    n_viol = report.violations.count()
    assert rows["checks_jvm"][3] + rows["audio_decode"][3] == n_viol
    # the shared cube saw every row exactly once
    assert rows["drift_cube"][3] == clips.count()
    # wall-times and percentages are sane
    assert all(r[1] >= 0.0 for r in rows.values())
    pcts = [r[2] for r in rows.values() if r[2] is not None]
    assert pcts and all(0.0 <= p <= 100.0 for p in pcts)
    # a section with samples and time reports a rate
    assert rows["drift_cube"][5] is None or rows["drift_cube"][5] > 0
    # reference-shaped text + DF surfaces
    text = prof.report_text()
    assert "ms / 1000 samples" in text and "hz" in text
    df = prof.report_df(spark)
    assert df.count() == len(rows)
    report.violations.unpersist()
    clips.unpersist()


def test_profiler_standalone_sections():
    prof = EngineProfiler()
    with prof.enclosing("run"):
        prof.start_section("a")
        prof.end_section("a")
        prof.add_samples("a", 1000)
    (name, took, pct, samples, ms1k, hz), = \
        [r for r in prof.report_rows() if r[0] == "a"]
    assert samples == 1000 and took >= 0.0 and pct is not None
