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


def make_batch_processor(store: CheckpointStore,
                         cfg: EngineConfig,
                         engine: ValidationEngine,
                         out_dir: str,
                         order_cols=("ds", "clip_id"),
                         validate: bool = True):
    """foreachBatch callback: mine + validate + commit one micro-batch.

    Idempotent under at-least-once replay: ``foreachBatch`` may re-deliver
    a batch whose state commit already happened (crash between
    ``store.commit`` and the stream checkpoint's own commit).  A batch
    whose key equals the latest committed ``batch_key`` is skipped —
    replaying it onto the already-updated state would double-count
    cluster sizes.  The reference's analog is restoring the latest
    snapshot on init (drain3/template_miner.py:80-122): state already
    containing a message's effect is never re-fed that message."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        hw, prior, counter, last_key = store.latest(spark)
        if last_key == f"stream-{batch_id}":
            return  # at-least-once replay of an already-committed batch
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
        # monotonic: prior + created, never max(live ids) (see jobs.py)
        new_counter = mined.updated_counter()
        next_id = (hw + 1) if hw is not None else 0
        store.commit(next_id, mined.clusters, new_counter,
                     batch_key=f"stream-{batch_id}")
        mined.unpersist()

    return process_batch


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

    process_batch = make_batch_processor(store, cfg, engine, out_dir,
                                         order_cols=order_cols,
                                         validate=validate)

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
