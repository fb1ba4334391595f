"""End-to-end batch demo (reference examples/drain_bigfile_demo.py:35-70
recast): synthesize a dirty clips table, validate + mine it through the
checkpointed incremental driver, print the reports and throughput.

Run:  python examples/batch_validate_demo.py [n_clips]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drain3_spark import fixtures as FX
from drain3_spark.config import EngineConfig
from drain3_spark.diagnostics import cluster_tree_report
from drain3_spark.jobs import run_incremental
from drain3_spark.operators.mining import CLUSTER_SCHEMA
from drain3_spark.session import get_spark
from drain3_spark.validation.runner import ValidationConfig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    spark = get_spark("batch_validate_demo")
    work = "/tmp/drain3_spark_demo"
    # fresh demo every run — a leftover state dir would resume past all
    # batches (which is exactly what the resume contract should do, but
    # makes a demo print nothing)
    import shutil
    shutil.rmtree(f"{work}/state", ignore_errors=True)
    shutil.rmtree(f"{work}/out", ignore_errors=True)

    print(f"synthesizing {n} clips (dirty, 7 day-partitions)...")
    FX.write_clips(FX.gen_clips(spark, n, dirty=True, dur_lo=100, dur_hi=400),
                   f"{work}/clips")
    FX.gen_transcripts_ref(spark, n, dirty=True, dur_lo=100, dur_hi=400) \
        .write.mode("overwrite").parquet(f"{work}/ref")

    clips = spark.read.parquet(f"{work}/clips")
    ref = spark.read.parquet(f"{work}/ref")

    t0 = time.time()
    results = run_incremental(
        spark, clips, f"{work}/state",
        cfg=EngineConfig(mining_mode="scalable", mining_salt=8),
        vcfg=ValidationConfig(drift_alpha=0.01, dur_bounds=(50, 1000)),
        transcripts_ref=ref, out_dir=f"{work}/out")
    dt = time.time() - t0

    total = sum(b.assignments_count for b in results)
    print(f"\n{total} clips validated+mined in {dt:.1f}s "
          f"({total / dt:.0f} clips/sec) across {len(results)} ds-batches")
    for b in results:
        print(f"  batch {b.batch_id} ds={b.ds}: {b.assignments_count} rows, "
              f"{len(b.clusters)} clusters (+{b.new_clusters} new)")

    last = results[-1]
    print("\nmined template clusters:")
    cdf = spark.createDataFrame(last.clusters, CLUSTER_SCHEMA)
    for r in cluster_tree_report(cdf, max_clusters=3).collect():
        for c in r.top_clusters:
            print(f"  [{r.group_key.split(chr(31))[0]:>3}] size={c['size']:6d}  {c['template'][:90]}")

    print("\nviolations by check (all batches + corpus passes):")
    per_ds = spark.read.option("basePath", f"{work}/out/violations") \
        .parquet(f"{work}/out/violations/ds=*") \
        .select("clip_id", "ds", "check", "detail")
    corpus = spark.read.parquet(f"{work}/out/violations_corpus")
    for r in (per_ds.unionByName(corpus).groupBy("check").count()
              .orderBy("check").collect()):
        print(f"  {r['check']:28s} {r['count']}")
    print("\nper-partition drift verdicts (corpus pass):")
    for r in spark.read.parquet(f"{work}/out/drift_report_corpus") \
            .orderBy("ds", "check").collect():
        mark = "PASS" if r.passed else "FAIL"
        print(f"  {r.ds} {r.check:22s} {mark}  {r.detail}")


if __name__ == "__main__":
    main()
