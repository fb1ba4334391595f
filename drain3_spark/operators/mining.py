"""Distributed template mining.

Spark lifecycle (SURVEY.md §3.1; semantics per reference
drain3/drain.py:188-226 and drain3/template_miner.py:134-162):

    scan → mask+tokenize (Catalyst, codegen) → derive group key
        → hash-shuffle on group key                       (one shuffle)
        → applyInPandas: sequential kernel fold per group (Arrow)
        → split assignments / cluster deltas (persisted, no recompute)
        → renumber new clusters deterministically (tiny DF)
        → broadcast id map back onto assignments          (no shuffle)

Group independence is exact: in the reference the first parse-tree
level is the token count (drain3/drain.py:288-290), so messages with
different token counts never interact.  "scalable" mode further splits
groups by the canonical token prefix — the deeper tree levels — which
the reference also keeps independent except for the rare cross-prefix
wildcard fallback (drain3/drain.py:313-314); that fallback is the one
documented approximation of scalable mode.

Cluster ids: the reference assigns sequential ids in creation order from
a single counter (drain3/drain.py:201-202).  Here each group mines with
local ids and every created cluster records the order key of its
creating row; a post-pass renumbers new clusters by that key, so with an
arrival-ordered key the ids are exactly the reference's.

Order-key contract: the order columns must sort the same as their
string form (e.g. zero-padded ids, ISO dates) — the engine uses the
concatenated string form both as cluster identity and as the
deterministic creation / recency order.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

logger = logging.getLogger(__name__)

from drain3_spark.config import EngineConfig
from drain3_spark.core.kernel import ClusterRec, TemplateBank
from drain3_spark.operators.masking import mask_col
from drain3_spark.util import local_df
from drain3_spark.operators.tokenize import group_key_cols, tokens_col

KEY_SEP = "\x1f"

# state-table schema: one row per live cluster.  ``routing`` is the
# creation-time token path (space-joined): the reference inserts a
# cluster into its parse tree once, at creation, and never re-inserts on
# template change (drain3/drain.py:211-213), so restoring a tree from
# final templates alone would put wildcard children where an
# uninterrupted run has none.
CLUSTER_SCHEMA = T.StructType([
    T.StructField("cluster_id", T.LongType()),
    T.StructField("group_key", T.StringType()),
    T.StructField("token_count", T.IntegerType()),
    T.StructField("template", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("created_key", T.StringType()),
    T.StructField("updated_key", T.StringType()),
    T.StructField("routing", T.StringType()),
])


def _pad_prior(row: tuple) -> tuple:
    """Tolerate pre-routing 7-column state tuples (routing <- template)."""
    row = tuple(row)
    if len(row) < 8:
        return row + (row[3],)
    if row[7] is None:
        return row[:7] + (row[3],)
    return row


def cluster_tuples_to_state(rows) -> List[tuple]:
    """CLUSTER_SCHEMA tuples -> kernel ``from_state`` rows
    (cid, template_tokens, size, created_key, updated_key, routing_tokens)."""
    out = []
    for r in rows:
        tokens = str(r[3]).split(" ") if r[3] else []
        routing = (str(r[7]).split(" ") if len(r) > 7 and r[7] else tokens)
        out.append((int(r[0]), tokens, int(r[4]), r[5] or "", r[6] or "", routing))
    return out


@dataclass
class MiningResult:
    assignments: DataFrame   # order cols + cluster_id, change_type, cluster_size, template_mined
    clusters: DataFrame      # CLUSTER_SCHEMA
    raw: DataFrame           # persisted UDF output (caller unpersists via .unpersist())
    prior_max: int = 0       # counter value the batch started from
    _counter: Optional[int] = None
    # post-merge NEW cluster refs (tiny, derived from a persisted frame);
    # lazily counted for the monotonic counter
    _new_refs: Optional[DataFrame] = None
    _extra_persisted: List[DataFrame] = field(default_factory=list)

    def updated_counter(self) -> int:
        """True monotonic cluster counter after this batch: prior counter
        + number of clusters CREATED (reference drain3/drain.py:201-202 —
        the counter never decreases, so ids of clusters later evicted by
        the LRU bound are never reused).  ``max(live ids)`` is wrong for
        exactly that reason."""
        if self._counter is None:
            if self._new_refs is not None:
                n_new = self._new_refs.count()
            else:
                n_new = (self.raw
                         .filter((F.col("row_kind") == "c")
                                 & F.col("cluster_ref").startswith("n:"))
                         .select("cluster_ref").distinct().count())
            self._counter = self.prior_max + n_new
        return self._counter

    def unpersist(self) -> None:
        self.raw.unpersist()
        for df in self._extra_persisted:
            df.unpersist()


_GROUP_EST_CACHE: dict = {}


def _estimate_groups(keyed: DataFrame, gnames: Sequence[str]) -> int:
    """Bounded-prefix group-count estimate, memoized per (application,
    logical plan).  It is an ESTIMATE feeding only the salt choice, so a
    scanned path whose files changed under an unchanged plan returning a
    stale count is harmless — but a new session must not inherit entries
    bound to a dead JVM, hence the applicationId in the key."""
    proj = keyed.select(*gnames)
    try:
        cache_key = (keyed.sparkSession.sparkContext.applicationId,
                     proj.semanticHash())
    except Exception:
        cache_key = None
    if cache_key is not None and cache_key in _GROUP_EST_CACHE:
        return _GROUP_EST_CACHE[cache_key]
    est = max(1, proj.limit(50000).distinct().count())
    if cache_key is not None:
        _GROUP_EST_CACHE[cache_key] = est
    return est


def _fold_schema(df: DataFrame, order_cols: Sequence[str]) -> T.StructType:
    fields = [T.StructField("row_kind", T.StringType())]
    for c in order_cols:
        fields.append(df.schema[c])
    fields += [
        T.StructField("ckey", T.StringType()),
        T.StructField("cluster_ref", T.StringType()),
        T.StructField("change_type", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("template", T.StringType()),
        T.StructField("group_key", T.StringType()),
        T.StructField("token_count", T.IntegerType()),
        T.StructField("updated_key", T.StringType()),
        T.StructField("routing", T.StringType()),
    ]
    return T.StructType(fields)


def mine_templates(df: DataFrame,
                   cfg: EngineConfig,
                   content_col: str = "transcript",
                   order_cols: Sequence[str] = ("ds", "clip_id"),
                   prior_clusters: Optional[List[tuple]] = None,
                   prior_counter: int = 0) -> MiningResult:
    """Mine templates from ``content_col``; returns per-row assignments and
    the updated cluster (state) table."""
    cfg.validate()
    spark = df.sparkSession
    from drain3_spark.shipping import ship_package
    ship_package(spark)
    order_cols = list(order_cols)

    # NO util.widen_small_scan here (measured): mining's own group-key
    # Exchange already redistributes before the heavy (kernel) stage, so
    # pre-widening a small scan only adds a round-robin shuffle ahead of
    # the cheap masking projection — 1.8s vs 1.25s at sf0.1 local[32]

    masked = mask_col(F.col(content_col), cfg.masking, cfg.mask_prefix, cfg.mask_suffix)
    # the shuffle carries the masked STRING, not the token array:
    # list<string> columns cost far more to Arrow-serialize and shuffle
    # than one string per row, and the kernel re-tokenizes in-UDF with
    # kernel.tokenize — parity-locked to this Catalyst tokenizer by
    # test_unicode_whitespace_tokenize_parity.  The group-key columns
    # below still derive from the token expression, but Catalyst prunes
    # the array away before the Exchange.
    keyed = df.select(
        *order_cols,
        F.concat_ws(KEY_SEP, *[F.col(c).cast("string") for c in order_cols]).alias("ckey"),
        masked.alias("masked"),
    )
    # null content never reaches the kernel: such rows are the null-rate
    # check's concern (SURVEY.md C2), not the miner's — the reference
    # would raise on a None message too (drain3/drain.py:182)
    keyed = keyed.filter(F.col("masked").isNotNull())
    toks = tokens_col(F.col("masked"), cfg.extra_delimiters)
    gcols = group_key_cols(toks, cfg)
    keyed = keyed.select("*", *gcols)
    if cfg.engine == "jaccard":
        gnames = ["first_token"]
        keyed = keyed.withColumn("token_count", F.size(toks))
    else:
        gnames = ["token_count"] + (["prefix_key"] if len(gcols) > 1 else [])
    # salt resolution: 0 = auto — make the post-shuffle mining stage's
    # task count track the cluster, not the corpus's group count (~6-13
    # distinct token counts on template corpora would otherwise cap it
    # forever, regardless of cluster size).
    # salt = ceil(2*parallelism / est_groups) so groups*salt ≈ 2x cores.
    # Corpora that already have many groups resolve to salt=1 and skip
    # the merge pass entirely.  The group-count estimate is:
    #   1. distinct group keys in the PRIOR state when one exists —
    #      deterministic and free (no job); incremental loops never pay
    #      an estimate job after the first batch;
    #   2. otherwise a bounded-prefix job (<=50k rows), memoized by the
    #      projection's semantic hash so repeated mines over the same
    #      input pay it once per session.  The prefix sample is
    #      partition-layout dependent; the resolved salt is logged so a
    #      semantics flip (salt 1 <-> >1 changes assignment-side
    #      change_type/cluster_size to bank-local) is always visible.
    #      The cluster table itself is salt-invariant.
    if cfg.mining_salt == 0:
        if prior_clusters:
            est_groups = max(1, len({r[1] for r in prior_clusters}))
        else:
            est_groups = _estimate_groups(keyed, gnames)
        par = spark.sparkContext.defaultParallelism
        salt = max(1, min(par, -(-2 * par // est_groups)))
        logger.info("mining auto-salt resolved: salt=%d (est_groups=%d, "
                    "parallelism=%d)", salt, est_groups, par)
    else:
        salt = cfg.mining_salt
    salted = salt > 1
    if salted:
        keyed = keyed.withColumn(
            "_salt", F.pmod(F.xxhash64("ckey"), F.lit(salt)))
        gnames.append("_salt")

    # broadcast prior state to executors (bounded by max_clusters)
    prior_rows: List[tuple] = [_pad_prior(r) for r in (prior_clusters or [])]
    bc_prior = spark.sparkContext.broadcast(prior_rows)
    prior_max = max([prior_counter] + [int(r[0]) for r in prior_rows]) if prior_rows else prior_counter

    kernel_kwargs = dict(
        sim_th=cfg.sim_th, depth=cfg.depth, max_children=cfg.max_children,
        # per-group LRU is exact for single-group data; the global bound is
        # re-applied at commit (reference drain3/drain.py:37-51 semantics).
        # salted banks never evict locally — the merge pass owns the bound
        max_clusters=None if salted else cfg.max_clusters,
        param_str=cfg.param_str,
        parametrize_numeric_tokens=cfg.parametrize_numeric_tokens,
    )
    engine_name = cfg.engine
    extra_delims = tuple(cfg.extra_delimiters)
    out_schema = _fold_schema(df, order_cols)

    def fold_group(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        if "first_token" in pdf.columns:
            gkey_parts = [str(pdf.iloc[0]["first_token"])]
        else:
            gkey_parts = [str(pdf.iloc[0]["token_count"])]
            if "prefix_key" in pdf.columns:
                gkey_parts.append(str(pdf.iloc[0]["prefix_key"]))
        group_key = KEY_SEP.join(gkey_parts)

        mine = [r for r in bc_prior.value if r[1] == group_key]
        state_rows = cluster_tuples_to_state(mine)
        bank_cls = TemplateBank
        if engine_name == "jaccard":
            from drain3_spark.core.kernel_jaccard import JaccardBank
            bank_cls = JaccardBank
        bank = bank_cls.from_state(state_rows, counter=None, **kernel_kwargs)
        bank.counter = max([rec.cid for rec in bank.registry.values()] or [0])
        prior_ids = set(bank.registry.keys())

        def ref_of(rec: ClusterRec) -> str:
            return f"g:{rec.cid}" if rec.cid in prior_ids else f"n:{rec.created_key}"

        out = {name: [] for name in out_schema.names}

        def emit(kind, ovals, ckey, cref, change, size, template, updated_key,
                 token_count=None, routing=""):
            out["row_kind"].append(kind)
            for c, v in zip(order_cols, ovals):
                out[c].append(v)
            out["ckey"].append(ckey)
            out["cluster_ref"].append(cref)
            out["change_type"].append(change)
            out["size"].append(size)
            out["template"].append(template)
            out["group_key"].append(group_key)
            out["token_count"].append(int(pdf.iloc[0]["token_count"])
                                       if token_count is None else int(token_count))
            out["updated_key"].append(updated_key)
            out["routing"].append(routing)

        ovals_cols = [pdf[c].tolist() for c in order_cols]
        ckeys = pdf["ckey"].tolist()
        # tokenize in-UDF from the masked string (kernel.tokenize is
        # parity-locked to the Catalyst tokenizer): the shuffle moved
        # one string per row instead of a list<string> column
        from drain3_spark.core.kernel import tokenize as _tokenize
        delims = extra_delims
        masked_list = pdf["masked"].tolist()
        # Exact-repeat fast path (drain engine): an ingest whose
        # change_type is "none" mutates nothing the tree search reads
        # (leaf id lists only grow on cluster_created; template tokens
        # only change on cluster_template_changed; size/updated_key/
        # recency are not search inputs), so an IDENTICAL masked string
        # must resolve to the same cluster with the same "none" outcome
        # until some OTHER row mutates the bank.  Memoize that, clear on
        # any mutating change — on template corpora nearly every row is
        # an exact repeat of a recent one, and the memo replaces
        # tokenize + tree walk + per-candidate scoring with one dict
        # probe (the sequential fold is the mining job's hot loop).
        # The jaccard bank keeps its own structures — no fast path.
        use_memo = engine_name != "jaccard"
        memo: dict = {}
        for i in range(len(pdf)):
            mstr = masked_list[i]
            hit = memo.get(mstr) if use_memo else None
            if hit is not None:
                rec, tmpl = hit
                rec.size += 1
                rec.updated_key = ckeys[i]
                if bank.max_clusters is not None:
                    bank.registry.move_to_end(rec.cid)
                emit("a", [col[i] for col in ovals_cols], ckeys[i],
                     ref_of(rec), "none", int(rec.size), tmpl, ckeys[i])
                continue
            tokens = _tokenize(mstr, delims)
            r = bank.ingest_tokens(tokens, order_key=ckeys[i])
            rec = bank.registry[r["cluster_id"]]
            if use_memo:
                if r["change_type"] == "none":
                    memo[mstr] = (rec, r["template_mined"])
                else:
                    memo.clear()
            emit("a", [col[i] for col in ovals_cols], ckeys[i], ref_of(rec),
                 r["change_type"], int(r["cluster_size"]), r["template_mined"], ckeys[i])

        first_ovals = [col[0] for col in ovals_cols]
        for rec in bank.registry.values():
            emit("c", first_ovals, rec.created_key, ref_of(rec), "",
                 int(rec.size), rec.template, rec.updated_key,
                 token_count=len(rec.tokens), routing=" ".join(rec.routing))
        return pd.DataFrame(out, columns=out_schema.names)

    # groupBy+applyInPandas inserts exactly one hash Exchange on the key
    folded = (keyed
              .groupBy(*gnames)
              .applyInPandas(fold_group, schema=out_schema)
              .persist())
    # materialize the fold NOW: clusters / id_map / assignments all scan
    # it, and a lazy persist lets one downstream action race its own
    # subtrees into computing the fold 2-3x (measured 20s vs 6s on the
    # jaccard mine+match entry).  The count is the mining work itself.
    # In salted mode the merge's own materialization below fills this
    # persist in the same job — don't pay a second action for it.
    if not salted:
        folded.count()

    clusters_raw = folded.filter(F.col("row_kind") == "c")
    assignments_raw = folded.filter(F.col("row_kind") == "a")

    extra_persisted: List[DataFrame] = []
    translate = None
    if salted:
        # distributed two-phase reconciliation: per-group bank merge as a
        # second tiny applyInPandas over the cluster rows ONLY (clusters
        # ≪ rows; each group's merge is independent).  Nothing is
        # collected to the driver — the former driver-side fold was
        # bounded by clusters × salt, a multi-million-row single-threaded
        # pass on a large cluster with max_clusters=10k.
        merged = (clusters_raw
                  .groupBy("group_key")
                  .applyInPandas(_make_group_merger(cfg, bc_prior),
                                 schema=MERGED_SCHEMA)
                  .persist())
        merged.count()   # materialize once; c/m splits below both scan it
        extra_persisted.append(merged)
        c_rows = (merged.filter(F.col("row_kind") == "c")
                  .select("cluster_ref", "group_key", "token_count",
                          "template", "size", "ckey", "updated_key",
                          "routing"))
        translate = (merged.filter(F.col("row_kind") == "m")
                     .select(F.col("cluster_ref").alias("orig_ref"),
                             "merged_ref"))
    else:
        c_rows = clusters_raw.select("cluster_ref", "group_key", "token_count",
                                     "template", "size", "ckey",
                                     "updated_key", "routing")

    # prior clusters whose group saw no rows this batch pass through
    # unchanged (they never reached a fold task)
    untouched = None
    if prior_rows:
        prior_df = local_df(spark, prior_rows, CLUSTER_SCHEMA)
        touched_groups = c_rows.select("group_key").distinct()
        untouched = prior_df.join(F.broadcast(touched_groups), "group_key", "left_anti") \
            .select(*[f.name for f in CLUSTER_SCHEMA.fields])

    # deterministic global renumbering of new clusters: prior ids are kept,
    # new ids continue the counter in creation-key order
    # (reference drain3/drain.py:201-202).  The window is over the tiny
    # cluster-row set, never the corpus.
    new = c_rows.filter(F.col("cluster_ref").startswith("n:"))
    prior = c_rows.filter(F.col("cluster_ref").startswith("g:"))
    w = Window.orderBy("ckey")
    new_ids = new.select(
        "cluster_ref",
        (F.lit(prior_max) + F.row_number().over(w)).alias("cluster_id"))
    prior_ids_df = prior.select(
        "cluster_ref",
        F.substring("cluster_ref", 3, 20).cast("long").alias("cluster_id"))
    id_map = new_ids.unionByName(prior_ids_df)

    clusters = (c_rows
                .join(F.broadcast(id_map), "cluster_ref")
                .select("cluster_id", "group_key", "token_count", "template",
                        F.col("size").cast("long").alias("size"),
                        F.col("ckey").alias("created_key"), "updated_key",
                        "routing"))
    if untouched is not None:
        clusters = clusters.unionByName(untouched)

    # global LRU bound re-applied at commit time: keep the max_clusters
    # most-recently-updated clusters (reference drain3/drain.py:37-51)
    if cfg.max_clusters is not None:
        rank_w = Window.orderBy(F.desc("updated_key"), F.desc("cluster_id"))
        clusters = (clusters
                    .withColumn("_r", F.row_number().over(rank_w))
                    .filter(F.col("_r") <= cfg.max_clusters)
                    .drop("_r"))

    # assignment rows carry ORIGINAL bank refs; in salted mode hop
    # through the merge's ref translation first
    if translate is not None:
        assign_map = (translate
                      .join(id_map.withColumnRenamed("cluster_ref",
                                                     "merged_ref"),
                            "merged_ref")
                      .select(F.col("orig_ref").alias("cluster_ref"),
                              "cluster_id"))
    else:
        assign_map = id_map

    # change_scope surfaces the documented salted-mode approximation IN
    # DATA, not just a log line: under auto-salt, per-row change_type /
    # cluster_size are BANK-LOCAL (the cluster table stays exact and
    # salt-invariant); downstream consumers filter on scope='global'
    # when they need reference-exact per-row change semantics
    assignments = (assignments_raw
                   .join(F.broadcast(assign_map), "cluster_ref")
                   .select(*order_cols,
                           "cluster_id",
                           "change_type",
                           F.col("size").alias("cluster_size"),
                           F.col("template").alias("template_mined"),
                           F.lit("bank" if salted else "global")
                           .alias("change_scope")))

    return MiningResult(assignments=assignments, clusters=clusters, raw=folded,
                        prior_max=prior_max, _new_refs=new.select("cluster_ref"),
                        _extra_persisted=extra_persisted)


# distributed-merge output: "c" rows are merged clusters keyed by their
# MERGED ref ("g:<prior id>" or "n:<created_key>"); "m" rows translate an
# original bank ref (cluster_ref) to its merged ref
MERGED_SCHEMA = T.StructType([
    T.StructField("row_kind", T.StringType()),
    T.StructField("cluster_ref", T.StringType()),
    T.StructField("merged_ref", T.StringType()),
    T.StructField("group_key", T.StringType()),
    T.StructField("token_count", T.IntegerType()),
    T.StructField("template", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("ckey", T.StringType()),
    T.StructField("updated_key", T.StringType()),
    T.StructField("routing", T.StringType()),
])


def _make_group_merger(cfg: EngineConfig, bc_prior):
    """Two-phase mine+merge reconciliation (SURVEY.md §7), DISTRIBUTED:
    one applyInPandas task per mining group, over cluster rows only
    (clusters ≪ rows; per-group merges are independent, so nothing is
    collected to the driver and the merge parallelism tracks the group
    count).

    * bank copies of a PRIOR cluster merge with the ENGINE's template
      merge — positional for drain (associative for equal-length
      sequences, drain3/drain.py:415-425), longer-sequence/intersection
      for jaccard (drain3/jaccard_drain.py:183-202, where bank copies of
      one cluster can legitimately differ in length); size = prior +
      per-bank increments.
    * NEW bank clusters are re-ingested into a merge bank of the SAME
      engine (seeded with the merged priors) in creation-key order — a
      new bank cluster may land in a prior cluster or found a merged new
      cluster; its bank size transfers to the target.

    Global renumbering of merged-new refs happens downstream in the
    shared finalization tail (window over the tiny cluster-row set).
    """
    engine_name = cfg.engine
    kw = dict(sim_th=cfg.sim_th, depth=cfg.depth,
              max_children=cfg.max_children, max_clusters=None,
              param_str=cfg.param_str,
              parametrize_numeric_tokens=cfg.parametrize_numeric_tokens)

    def merge_group(pdf):
        import pandas as pd
        from drain3_spark.core.kernel import ClusterRec, TemplateBank
        bank_cls = TemplateBank
        if engine_name == "jaccard":
            from drain3_spark.core.kernel_jaccard import JaccardBank
            bank_cls = JaccardBank

        gkey = str(pdf.iloc[0]["group_key"])
        prior_by_id = {int(p[0]): p for p in bc_prior.value}
        pdf = pdf.sort_values("ckey", kind="mergesort")
        rows = pdf.to_dict("records")

        bank = bank_cls(**kw)
        out = {name: [] for name in MERGED_SCHEMA.names}

        def emit(kind, ref, merged_ref, token_count, template, size,
                 ckey, updated_key, routing):
            out["row_kind"].append(kind)
            out["cluster_ref"].append(ref)
            out["merged_ref"].append(merged_ref)
            out["group_key"].append(gkey)
            out["token_count"].append(int(token_count))
            out["template"].append(template)
            out["size"].append(int(size))
            out["ckey"].append(ckey)
            out["updated_key"].append(updated_key)
            out["routing"].append(routing)

        merged_prior: dict = {}
        for r in rows:
            if not r["cluster_ref"].startswith("g:"):
                continue
            pid = int(r["cluster_ref"][2:])
            tks = r["template"].split(" ") if r["template"] else []
            mp = merged_prior.get(pid)
            if mp is None:
                merged_prior[pid] = {"tokens": tks, "delta": 0,
                                     "upd": r["updated_key"] or ""}
            else:
                mp["tokens"] = list(bank.merge_template(tks, mp["tokens"]))
                mp["upd"] = max(mp["upd"], r["updated_key"] or "")
            merged_prior[pid]["delta"] += \
                int(r["size"]) - int(prior_by_id[pid][4])

        for pid in sorted(merged_prior):
            p = prior_by_id[pid]
            routing = (p[7] or "").split(" ") if p[7] else []
            rec = ClusterRec(pid, merged_prior[pid]["tokens"],
                             created_key=p[5] or "",
                             size=int(p[4]) + merged_prior[pid]["delta"],
                             routing=routing)
            rec.updated_key = max(p[6] or "", merged_prior[pid]["upd"])
            bank.registry[rec.cid] = rec
            bank._insert_path(rec)
            emit("m", f"g:{pid}", f"g:{pid}", 0, "", 0, "", "", "")
        prior_ids = set(bank.registry)

        def merged_ref_of(rec: ClusterRec) -> str:
            return (f"g:{rec.cid}" if rec.cid in prior_ids
                    else f"n:{rec.created_key}")

        for r in rows:
            if not r["cluster_ref"].startswith("n:"):
                continue
            tks = r["template"].split(" ") if r["template"] else []
            routing = r["routing"].split(" ") if r["routing"] else []
            res = bank.ingest_tokens(tks, order_key=r["ckey"] or "",
                                     routing_tokens=routing)
            rec = bank.registry[int(res["cluster_id"])]
            rec.size += int(r["size"]) - 1  # ingest counted 1; bank size owns it
            rec.updated_key = max(rec.updated_key, r["updated_key"] or "")
            emit("m", r["cluster_ref"], merged_ref_of(rec), 0, "", 0, "", "", "")

        for rec in bank.registry.values():
            emit("c", merged_ref_of(rec), None, len(rec.tokens), rec.template,
                 rec.size, rec.created_key, rec.updated_key,
                 " ".join(rec.routing))
        return pd.DataFrame(out, columns=MERGED_SCHEMA.names)

    return merge_group
