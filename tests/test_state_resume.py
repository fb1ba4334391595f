"""Checkpoint/resume semantics (SURVEY.md C10; relational mirror of the
reference snapshot round-trip, tests/test_template_miner.py:25-61)."""

import pytest

from drain3_spark import fixtures as FX
from drain3_spark.config import EngineConfig
from drain3_spark.jobs import run_incremental
from drain3_spark.state.store import CheckpointStore


def test_store_roundtrip(spark, tmp_path):
    store = CheckpointStore(str(tmp_path / "state"))
    assert store.latest(spark) == (None, [], 0, "")
    clips = FX.gen_clips(spark, 30, dur_lo=200, dur_hi=400)
    from drain3_spark.operators.mining import mine_templates
    mined = mine_templates(clips, EngineConfig())
    store.commit(0, mined.clusters, counter=5, batch_key="2026-08-01")
    hw, rows, counter, key = store.latest(spark)
    assert hw == 0 and counter == 5 and key == "2026-08-01"
    assert sorted(r[0] for r in rows) == sorted(
        r.cluster_id for r in mined.clusters.collect())
    mined.unpersist()


def test_resume_equals_uninterrupted(spark, tmp_path):
    clips = FX.gen_clips(spark, 120, dirty=False, n_ds=3,
                         dur_lo=200, dur_hi=400).cache()

    full = run_incremental(spark, clips, str(tmp_path / "full"),
                           validate=False)
    assert [b.ds for b in full] == ["2026-08-01", "2026-08-02", "2026-08-03"]

    # interrupted run: first two batches, then a "new process" resumes
    part_dir = str(tmp_path / "part")
    two_ds = clips.filter(clips.ds != "2026-08-03")
    first = run_incremental(spark, two_ds, part_dir, validate=False)
    assert len(first) == 2
    resumed = run_incremental(spark, clips, part_dir, validate=False)
    assert [b.ds for b in resumed] == ["2026-08-03"]

    final_full = {tuple(r) for r in full[-1].clusters}
    final_resumed = {tuple(r) for r in resumed[-1].clusters}
    assert final_full == final_resumed
    assert full[-1].counter == resumed[-1].counter

    # re-running once more is a no-op (idempotence)
    assert run_incremental(spark, clips, part_dir, validate=False) == []
    clips.unpersist()


def test_incremental_outputs_and_lineage(spark, tmp_path):
    """run_incremental writes assignments/violations/lineage per batch and
    the corpus-level orphan + drift reports (SURVEY.md C9/C12)."""
    from drain3_spark import fixtures as FX
    from drain3_spark.validation.runner import ValidationConfig

    n = 300
    clips = FX.gen_clips(spark, n, dirty=True, n_ds=3, dur_lo=200, dur_hi=500)
    ref = FX.gen_transcripts_ref(spark, n, dirty=True, n_ds=3,
                                 dur_lo=200, dur_hi=500)
    out = str(tmp_path / "out")
    results = run_incremental(spark, clips, str(tmp_path / "state"),
                              vcfg=ValidationConfig(drift_alpha=0.01),
                              transcripts_ref=ref, out_dir=out)
    assert len(results) == 3
    lineage = spark.read.option("basePath", f"{out}/lineage") \
        .parquet(f"{out}/lineage/ds=*").collect()
    assert {r.ds for r in lineage} == {"2026-08-01", "2026-08-02", "2026-08-03"}
    assert all(r.rows_mined > 0 and r.templates_seen > 0 for r in lineage)
    # drift report exists and only the shifted partition fails
    drift = spark.read.parquet(f"{out}/drift_report_corpus").collect()
    fails = {(r.ds, r.check) for r in drift if not r.passed}
    assert all(ds == "2026-08-03" for ds, _ in fails)
    assert fails, "shifted partition must fail at least one drift check"
