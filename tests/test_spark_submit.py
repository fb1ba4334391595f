"""End-to-end spark-submit deployment: the north-rule clause
`spark-submit --py-files drain3_spark.zip scripts/validate_job.py`
must actually run in a FRESH JVM with the package shipped only through
the zip (not the repo checkout on the driver's sys.path)."""

import json
import os
import subprocess
import sys

import pytest

from drain3_spark import fixtures as FX
from drain3_spark.shipping import build_pkg_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files_validate_job(spark, tmp_path):
    clips_path = str(tmp_path / "clips")
    ref_path = str(tmp_path / "ref")
    clips = FX.gen_clips(spark, 120, dirty=True, n_ds=3,
                         dur_lo=200, dur_hi=400)
    FX.write_clips(clips, clips_path)
    FX.gen_transcripts_ref(spark, 120, dirty=True, n_ds=3, dur_lo=200,
                           dur_hi=400).write.mode("overwrite").parquet(ref_path)

    zip_path = build_pkg_zip(str(tmp_path / "drain3_spark.zip"))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # package must come from the zip
    out = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "validate_job.py"),
         "--clips", clips_path, "--ref", ref_path,
         "--state", str(tmp_path / "state"),
         "--out", str(tmp_path / "reports")],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env)     # cwd OUTSIDE the repo checkout
    assert out.returncode == 0, out.stderr[-3000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["batches"] == 3 and result["rows"] >= 120

    # the submitted job's outputs land where a cluster run would put them
    viol = spark.read.parquet(str(tmp_path / "reports" / "violations"))
    # same corpus validated in-process must agree on violation rows
    from drain3_spark.validation.runner import ValidationConfig, ValidationEngine
    want = ValidationEngine(ValidationConfig(with_drift=False)).violations(
        clips, spark.read.parquet(ref_path)).count()
    assert viol.count() == want
