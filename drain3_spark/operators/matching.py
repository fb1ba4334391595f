"""Read-only template matching (inference).

Reference semantics: drain3/drain.py:427-472 — perfect wildcard-aware
match (required similarity 1.0, wildcard slots count as matches), no
state mutation; strategies ``never`` (tree descent only), ``fallback``
(tree, then linear scan of same-token-count clusters), ``always``
(linear scan).

Two implementations:

* :func:`match_clusters_sql` — pure Catalyst broadcast join for the
  ``always`` strategy: clips ⨝ broadcast(clusters) on token_count,
  perfect-match filter via ``forall(zip_with(...))``, argmax selection
  with ``max_by``.  Single narrow stage after one broadcast; this is the
  scale path for bulk inference (SURVEY.md §3.2).
* :func:`match_clusters` — kernel-backed Arrow pandas UDF supporting all
  three strategies exactly (the tree's wildcard-fallback descent is not
  expressible as an equi-join); the bank is built once per executor from
  the broadcast state and cached.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from drain3_spark.config import EngineConfig
from drain3_spark.operators.masking import mask_col
from drain3_spark.operators.tokenize import tokens_col


def match_clusters_sql(df: DataFrame,
                       clusters: DataFrame,
                       cfg: EngineConfig,
                       content_col: str = "transcript") -> DataFrame:
    """``always``-strategy bulk inference as one broadcast hash join.

    Selection among perfect matches follows the reference's argmax on
    (similarity, wildcard count) with deterministic tie-break
    (drain3/drain.py:142-148); unmatched rows keep a null
    ``matched_cluster_id`` (violation candidates, SURVEY.md C6).
    """
    w = cfg.param_str
    masked = mask_col(F.col(content_col), cfg.masking, cfg.mask_prefix, cfg.mask_suffix)
    toks = tokens_col(masked, cfg.extra_delimiters)
    lhs = df.withColumn("_tokens", toks).withColumn("_tc", F.size("_tokens"))

    rhs = (clusters
           .select(F.col("cluster_id").alias("_cid"),
                   F.col("token_count").alias("_ctc"),
                   F.when(F.col("template") == "", F.array().cast("array<string>"))
                    .otherwise(F.split(F.col("template"), " ")).alias("_tpl")))

    tpl, mtoks = F.col("_tpl"), F.col("_tokens")
    perfect = F.forall(F.zip_with(tpl, mtoks, lambda a, b: (a == F.lit(w)) | (a == b)),
                       lambda x: x)
    wild_count = F.size(F.filter(tpl, lambda t: t == F.lit(w)))

    joined = (lhs.join(F.broadcast(rhs), F.col("_tc") == F.col("_ctc"), "left")
              .withColumn("_ok", F.when(F.col("_cid").isNotNull(), perfect))
              .withColumn("_wc", F.when(F.col("_ok"), wild_count)))
    # reference argmax keeps the highest (sim, param_count); all perfect
    # matches tie on sim, so rank by wildcard count, then stable id
    best = (joined
            .groupBy(*df.columns)
            .agg(F.max_by(
                F.struct(F.col("_cid").alias("cluster_id"),
                         F.concat_ws(" ", F.col("_tpl")).alias("template")),
                F.when(F.col("_ok"),
                       F.struct(F.col("_wc").alias("w"),
                                (-F.col("_cid")).alias("i")))).alias("_m")))
    return (best
            .withColumn("matched_cluster_id", F.col("_m.cluster_id"))
            .withColumn("matched_template", F.col("_m.template"))
            .drop("_m"))


def match_clusters(df: DataFrame,
                   cluster_rows: List[tuple],
                   cfg: EngineConfig,
                   content_col: str = "transcript",
                   strategy: str = "never") -> DataFrame:
    """Exact all-strategy inference via a kernel-backed Arrow UDF.

    ``cluster_rows`` are state-table tuples (see mining.CLUSTER_SCHEMA);
    the bank is rebuilt once per Python worker and reused across batches.
    """
    assert strategy in ("never", "fallback", "always")
    spark = df.sparkSession
    from drain3_spark.shipping import ship_package
    ship_package(spark)
    bc = spark.sparkContext.broadcast(list(cluster_rows))
    kw = dict(sim_th=cfg.sim_th, depth=cfg.depth, max_children=cfg.max_children,
              max_clusters=None, param_str=cfg.param_str,
              parametrize_numeric_tokens=cfg.parametrize_numeric_tokens)

    @pandas_udf(T.LongType())
    def match_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from drain3_spark.core.kernel import TemplateBank
        rows = bc.value
        state = [(int(r[0]), str(r[3]).split(" ") if r[3] else [], int(r[4]),
                  r[5] or "", r[6] or "") for r in rows]
        state.sort(key=lambda s: s[0])
        bank = TemplateBank.from_state(state, **kw)
        for series in it:
            out = []
            for tokens in series:
                rec = bank.match_tokens(list(tokens), strategy)
                out.append(rec.cid if rec is not None else None)
            yield pd.Series(out, dtype="object")

    masked = mask_col(F.col(content_col), cfg.masking, cfg.mask_prefix, cfg.mask_suffix)
    toks = tokens_col(masked, cfg.extra_delimiters)
    return df.withColumn("matched_cluster_id", match_udf(toks))
