"""Stateful-streaming template mining via ``applyInPandasWithState``.

The foreachBatch driver (streaming.py) is the engine's EXACT path: it
owns a global cluster counter, reference-identical ids, and snapshot
cadence through the engine's own CheckpointStore.  This module is the
Structured-Streaming-native alternative: per-group mining state lives in
Spark's state store, keyed by the mining group (token count — the
reference tree's first level, drain3/drain.py:288-290), checkpointed and
restored by the stream runtime itself.

Semantics relative to the reference (documented, deterministic):

* cluster ids are GROUP-LOCAL (``token_count * ID_STRIDE + local_id``):
  a per-group stateful operator cannot coordinate a global creation-order
  counter without a second shuffle; group-local ids are stable across
  restarts because each group's counter lives in its state row.
  :func:`renumber_to_reference_ids` is the post-pass that maps them to
  the reference's global creation-order ids (drain3/drain.py:201-202)
  when the stream delivers rows in (ds, clip_id) order — the same order
  contract the batch miner and the reference differential use.
* templates, change types, and per-cluster sizes are exactly the
  kernel's — groups never interact in the reference either.

At scale this is the shape with NO driver round-trip per micro-batch:
state updates stay on the executors that own each group's shuffle
partition, and the stream checkpoint gives exactly-once recovery of the
mining state itself.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from drain3_spark.config import EngineConfig
from drain3_spark.operators.masking import mask_col
from drain3_spark.operators.tokenize import tokens_col

# group-local id = token_count * ID_STRIDE + per-group creation index;
# collision-free for any realistic per-group cluster population
ID_STRIDE = 1_000_000

OUTPUT_SCHEMA = T.StructType([
    T.StructField("ds", T.StringType()),
    T.StructField("clip_id", T.StringType()),
    T.StructField("token_count", T.IntegerType()),
    T.StructField("cluster_id", T.LongType()),
    T.StructField("change_type", T.StringType()),
    T.StructField("cluster_size", T.LongType()),
    T.StructField("template_mined", T.StringType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("state_json", T.StringType()),
    T.StructField("counter", T.LongType()),
])


def _make_stateful_miner(cfg: EngineConfig):
    kw = dict(sim_th=cfg.sim_th, depth=cfg.depth,
              max_children=cfg.max_children, max_clusters=cfg.max_clusters,
              param_str=cfg.param_str,
              parametrize_numeric_tokens=cfg.parametrize_numeric_tokens)

    def mine_group(key: Tuple[Any, ...],
                   pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
        from drain3_spark.core.kernel import TemplateBank
        token_count = int(key[0])

        if state.exists:
            st_json, counter = state.get
            rows = json.loads(st_json)
            bank = TemplateBank.from_state(rows, counter=int(counter), **kw)
        else:
            bank = TemplateBank(**kw)

        out = {name: [] for name in OUTPUT_SCHEMA.names}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ds", "clip_id"], kind="mergesort")
            for ds, clip_id, tokens in zip(pdf["ds"], pdf["clip_id"],
                                           pdf["tokens"]):
                r = bank.ingest_tokens(list(tokens),
                                       order_key=f"{ds}\x1f{clip_id}")
                out["ds"].append(ds)
                out["clip_id"].append(clip_id)
                out["token_count"].append(token_count)
                out["cluster_id"].append(token_count * ID_STRIDE
                                         + int(r["cluster_id"]))
                out["change_type"].append(r["change_type"])
                out["cluster_size"].append(int(r["cluster_size"]))
                out["template_mined"].append(r["template_mined"])

        state.update((json.dumps(bank.export_state()), int(bank.counter)))
        yield pd.DataFrame(out, columns=OUTPUT_SCHEMA.names)

    return mine_group


def stateful_mining_stream(stream_df: DataFrame,
                           cfg: EngineConfig,
                           content_col: str = "transcript") -> DataFrame:
    """Build the stateful mining transformation over a streaming
    DataFrame: mask+tokenize in Catalyst, shuffle once on the group key,
    mine inside ``applyInPandasWithState`` (Arrow), state per group."""
    from drain3_spark.shipping import ship_package
    ship_package(stream_df.sparkSession)
    masked = mask_col(F.col(content_col), cfg.masking,
                      cfg.mask_prefix, cfg.mask_suffix)
    toks = tokens_col(masked, cfg.extra_delimiters)
    keyed = (stream_df
             .select("ds", "clip_id", toks.alias("tokens"))
             .filter(F.col("tokens").isNotNull())
             .withColumn("token_count", F.size("tokens")))
    return (keyed
            .groupBy("token_count")
            .applyInPandasWithState(_make_stateful_miner(cfg),
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def renumber_to_reference_ids(output: DataFrame) -> DataFrame:
    """Map group-local stateful cluster ids to the reference's GLOBAL
    creation-order ids (drain3/drain.py:201-202: a monotonic counter
    incremented once per cluster creation).

    Every cluster's creation is visible in the appended output as its
    ``change_type == 'cluster_created'`` row, and that creating row is
    the same row in the stateful and sequential paths (per-group mining
    is deterministic in row order).  So when micro-batches arrive in
    (ds, clip_id)-consistent order — the corpus order contract every
    batch/differential surface already uses — ranking creation events by
    (ds, clip_id) reproduces the reference counter exactly.  The rank
    runs over the cluster table only (bounded by max_clusters, one tiny
    single-partition window), and the id map joins back as a broadcast —
    the big output table is never shuffled."""
    created = (output.filter(F.col("change_type") == "cluster_created")
               .groupBy("cluster_id")
               .agg(F.min(F.struct("ds", "clip_id")).alias("_first")))
    from pyspark.sql import Window
    rank = F.row_number().over(
        Window.orderBy(F.col("_first.ds"), F.col("_first.clip_id")))
    idmap = created.select(F.col("cluster_id").alias("_local_id"),
                           rank.cast("long").alias("_global_id"))
    return (output
            .join(F.broadcast(idmap),
                  output["cluster_id"] == F.col("_local_id"), "left")
            .withColumn("cluster_id",
                        F.coalesce(F.col("_global_id"), F.col("cluster_id")))
            .drop("_local_id", "_global_id"))


def run_stateful_streaming(spark: SparkSession,
                           source_dir: str,
                           schema,
                           checkpoint_dir: str,
                           out_dir: str,
                           cfg: EngineConfig = None,
                           max_files_per_trigger: int = 8,
                           timeout_sec: float = 600) -> None:
    """Drive the stateful miner over a file stream with availableNow:
    processes everything currently in ``source_dir``, appending
    assignments to ``out_dir``; mining state survives in the stream
    checkpoint and restarts resume it."""
    cfg = cfg or EngineConfig()
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))
    mined = stateful_mining_stream(stream, cfg)
    query = (mined.writeStream
             .format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", checkpoint_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
    query.awaitTermination(timeout_sec)
    query.stop()
