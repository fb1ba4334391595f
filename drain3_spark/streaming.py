"""Structured Streaming driver (reference A21,
examples/drain_stdin_demo.py recast as readStream + foreachBatch).

Micro-batches arrive from any streaming source (file source here —
new parquet files landing under a directory; Kafka in production);
every micro-batch is mined through the checkpointed cluster state and
validated, mirroring the reference's one-at-a-time
``add_log_message`` loop at micro-batch granularity
(drain3/template_miner.py:134-162).

Snapshot cadence: the reference snapshots on every cluster change and
periodically (drain3/template_miner.py:124-132); here every micro-batch
commits its state atomically — change-driven cadence with the trigger
interval as the periodic bound.  Late data: the reference has no event
time (arrival order IS processing order, drain3/drain.py:188); the
stream preserves that by processing batches in arrival order with the
batch id as the order prefix.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from drain3_spark.config import EngineConfig
from drain3_spark.operators.mining import mine_templates
from drain3_spark.state.store import CheckpointStore
from drain3_spark.validation.runner import ValidationConfig, ValidationEngine


def run_streaming(spark: SparkSession,
                  source_dir: str,
                  schema,
                  state_dir: str,
                  out_dir: str,
                  cfg: Optional[EngineConfig] = None,
                  vcfg: Optional[ValidationConfig] = None,
                  order_cols=("ds", "clip_id"),
                  validate: bool = True,
                  max_files_per_trigger: int = 8,
                  timeout_sec: Optional[float] = None,
                  once: bool = True):
    """Stream clips files through mine+validate with checkpointed state.

    ``once=True`` processes all available input then stops (the batch
    replay shape used in tests); otherwise the query runs until
    ``timeout_sec``.
    """
    cfg = cfg or EngineConfig()
    engine = ValidationEngine(vcfg or ValidationConfig())
    store = CheckpointStore(state_dir)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hw, prior, counter, _ = store.latest(spark)
        mined = mine_templates(batch_df, cfg, order_cols=order_cols,
                               prior_clusters=prior, prior_counter=counter)
        mined.assignments.write.mode("overwrite").parquet(
            f"{out_dir}/assignments/batch={batch_id}")
        if validate:
            report = engine.validate(batch_df, include_orphans=False)
            report.violations.write.mode("overwrite").parquet(
                f"{out_dir}/violations/batch={batch_id}")
            report.partition_report.write.mode("overwrite").parquet(
                f"{out_dir}/partition_report/batch={batch_id}")
            report.violations.unpersist()
        rows = [tuple(r) for r in mined.clusters.collect()]
        new_counter = max([counter] + [int(r[0]) for r in rows])
        next_id = (hw + 1) if hw is not None else 0
        store.commit(next_id, mined.clusters, new_counter,
                     batch_key=f"stream-{batch_id}")
        mined.unpersist()

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", f"{state_dir}/_stream_checkpoint"))
    if once:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination(timeout_sec or 600)
        query.stop()
    else:
        query = writer.start()
        if timeout_sec:
            query.awaitTermination(timeout_sec)
            query.stop()
    return store
