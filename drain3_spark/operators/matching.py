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

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
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

    # fold the (small) cluster table into one candidate array per token
    # count, so inference is broadcast-join + array argmax: ZERO shuffle
    # of the big side, nothing but the join key and tokens computed per row
    rhs = (clusters
           .select(F.col("token_count").alias("_ctc"),
                   F.struct(
                       F.col("cluster_id").alias("cid"),
                       F.when(F.col("template") == "",
                              F.array().cast("array<string>"))
                       .otherwise(F.split(F.col("template"), " ")).alias("tpl"),
                   ).alias("_cand"))
           .groupBy("_ctc")
           .agg(F.collect_list("_cand").alias("_cands")))

    mtoks = F.col("_tokens")

    def perfect(c):
        return F.forall(F.zip_with(c["tpl"], mtoks,
                                   lambda a, b: (a == F.lit(w)) | (a == b)),
                        lambda x: x)

    # argmax on (wildcard_count, -cid): reference keeps the highest
    # param_count among perfect matches with a stable tie-break
    # (drain3/drain.py:142-148)
    ranked = F.transform(
        F.filter(F.col("_cands"), perfect),
        lambda c: F.struct(
            F.size(F.filter(c["tpl"], lambda t: t == F.lit(w))).alias("wc"),
            (-c["cid"]).alias("negcid"),
            c["cid"].alias("cid"),
            F.concat_ws(" ", c["tpl"]).alias("template")))
    best = F.array_max(ranked)

    return (lhs.join(F.broadcast(rhs), F.col("_tc") == F.col("_ctc"), "left")
            .withColumn("_best", best)
            .withColumn("matched_cluster_id", F.col("_best.cid"))
            .withColumn("matched_template", F.col("_best.template"))
            .drop("_tokens", "_tc", "_ctc", "_cands", "_best"))


def match_clusters_sql_jaccard(df: DataFrame,
                               clusters: DataFrame,
                               cfg: EngineConfig,
                               content_col: str = "transcript") -> DataFrame:
    """Jaccard-engine bulk inference as one broadcast hash join — the
    scale path for JaccardDrain matching (reference
    drain3/jaccard_drain.py:204-227: candidate set = clusters under the
    message's FIRST token, required similarity 0.8 with the 1.3 gain,
    wildcard slots excluded per :150-180).

    Candidates join on the cluster's creation-time first token (the
    tree's level-1 key, jaccard_drain.py:22-31); similarity is set
    Jaccard via ``array_intersect``/``array_union`` — pure Catalyst,
    ZERO shuffle of the big side.  Ties argmax (sim, wildcard count,
    lowest cluster id).
    """
    w = cfg.param_str
    required = 0.8  # drain3/jaccard_drain.py:209
    masked = mask_col(F.col(content_col), cfg.masking, cfg.mask_prefix, cfg.mask_suffix)
    toks = tokens_col(masked, cfg.extra_delimiters)
    lhs = (df.withColumn("_tokens", toks)
           .withColumn("_first", F.coalesce(F.get("_tokens", 0), F.lit("")))
           # hoisted per ROW: the unequal-length right side is always the
           # distinct message tokens (jaccard_drain.py:150-166)
           .withColumn("_mdis", F.array_distinct("_tokens"))
           .withColumn("_n", F.size("_tokens")))

    # candidate structs per first-token key; everything that depends on
    # the TEMPLATE alone (length, wildcard count, distinct non-wildcard
    # set, display string) is computed once per cluster here — not per
    # (row, candidate) pair inside the transform (measured 19s -> ~4s on
    # 5k docs x 1.5k clusters).  The routing column carries the
    # creation-time tokens whose head is the tree key.
    route = F.coalesce(F.col("routing"), F.col("template"))
    first_tok = F.coalesce(F.get(F.split(route, " "), 0), F.lit(""))
    tpl = F.when(F.col("template") == "", F.array().cast("array<string>")) \
        .otherwise(F.split(F.col("template"), " "))
    rhs = (clusters
           .select(first_tok.alias("_cfirst"),
                   F.struct(
                       F.col("cluster_id").alias("cid"),
                       tpl.alias("tpl"),
                       F.size(tpl).alias("n"),
                       F.size(F.filter(tpl, lambda t: t == F.lit(w))).alias("wc"),
                       F.array_distinct(
                           F.filter(tpl, lambda t: t != F.lit(w))).alias("sa"),
                       F.col("template").alias("template"),
                   ).alias("_cand"))
           .groupBy("_cfirst")
           .agg(F.collect_list("_cand").alias("_cands")))

    mtoks = F.col("_tokens")

    def scored(c):
        # equal lengths: drop message tokens at wildcard slots
        # (jaccard_drain.py:150-166); else compare whole sequences
        right = F.when(
            (c["n"] == F.col("_n")) & (c["wc"] > 0),
            F.array_distinct(
                F.filter(F.zip_with(c["tpl"], mtoks,
                                    lambda a, b: F.when(a == F.lit(w), F.lit(None))
                                    .otherwise(b)),
                         lambda x: x.isNotNull()))
        ).otherwise(F.col("_mdis"))
        uni = F.size(F.array_union(c["sa"], right))
        sim0 = F.when(uni == 0,
                      # empty template matches anything (kernel: len 0 -> 1.0)
                      F.when(c["n"] == 0, F.lit(1.0)).otherwise(F.lit(0.0))) \
            .otherwise(F.size(F.array_intersect(c["sa"], right)) / uni)
        sim = F.when(sim0 * 1.3 < 1.0, sim0 * 1.3).otherwise(F.lit(1.0))
        return F.struct(sim.alias("sim"), c["wc"].alias("wc"),
                        (-c["cid"]).alias("negcid"), c["cid"].alias("cid"),
                        c["template"].alias("template"))

    ranked = F.transform(F.col("_cands"), scored)
    best = F.array_max(ranked)

    return (lhs.join(F.broadcast(rhs), F.col("_first") == F.col("_cfirst"), "left")
            .withColumn("_best", best)
            .withColumn("matched_cluster_id",
                        F.when(F.col("_best.sim") >= required, F.col("_best.cid")))
            .withColumn("matched_template",
                        F.when(F.col("_best.sim") >= required,
                               F.col("_best.template")))
            .drop("_tokens", "_first", "_mdis", "_n", "_cfirst", "_cands", "_best"))


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

    engine_name = cfg.engine

    @pandas_udf(T.LongType())
    def match_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from drain3_spark.core.kernel import TemplateBank
        if engine_name == "jaccard":
            from drain3_spark.core.kernel_jaccard import JaccardBank as TemplateBank
        from drain3_spark.operators.mining import cluster_tuples_to_state
        rows = bc.value
        state = cluster_tuples_to_state(rows)
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
