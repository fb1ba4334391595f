"""spark-submit entry point: batch validation job (reference A21,
examples/drain_bigfile_demo.py recast).

    spark-submit --py-files drain3_spark.zip scripts/validate_job.py \
        --clips /data/clips --ref /data/transcripts_ref \
        --state /chk/state --out /data/reports [--engine drain|jaccard]

Build the zip with:
    python -c "from drain3_spark.shipping import build_pkg_zip; print(build_pkg_zip())"
"""
import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", required=True)
    ap.add_argument("--ref")
    ap.add_argument("--state", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--engine", default="drain", choices=["drain", "jaccard"])
    ap.add_argument("--mining-mode", default="scalable", choices=["exact", "scalable"])
    ap.add_argument("--mining-salt", type=int, default=1)
    ap.add_argument("--config-ini")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")

    from drain3_spark.config import EngineConfig
    from drain3_spark.jobs import run_incremental

    cfg = EngineConfig.load_ini(args.config_ini) if args.config_ini else EngineConfig()
    cfg.engine = args.engine
    cfg.mining_mode = args.mining_mode
    cfg.mining_salt = args.mining_salt

    clips = spark.read.parquet(args.clips)
    ref = spark.read.parquet(args.ref) if args.ref else None
    t0 = time.time()
    results = run_incremental(spark, clips, args.state, cfg=cfg,
                              transcripts_ref=ref, out_dir=args.out)
    n = sum(b.assignments_count for b in results)
    dt = time.time() - t0
    print(json.dumps({"batches": len(results), "rows": n,
                      "sec": round(dt, 2),
                      "clips_per_sec": round(n / dt, 1) if dt else None}))


if __name__ == "__main__":
    main()
