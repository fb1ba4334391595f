"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the correctness baseline: one narrow pass
  computing dot/norms with ``F.zip_with`` + ``F.aggregate`` (JVM
  higher-order functions, no UDF), then a global top-k (Spark's
  ``orderBy().limit(k)`` is a per-partition heap + driver merge, not a
  full sort).
* IVF top-k — the scale path: deterministic coarse centroids (the first
  C vectors by id), every vector assigned to its nearest centroid once
  (broadcast join + ``min_by``), queries probe only the P nearest
  buckets.  Recall < 1 by construction; the bench reports both.
* cosine near-dup pairs within blocks (embedding dedup).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    from drain3_spark.util import widen_small_scan
    q = _vec_lit(query)
    # per-row HOF cosine is interpreted — don't let a one-partition
    # scan serialize the whole corpus onto one task (no-op at scale)
    return (widen_small_scan(embeddings)
            .select(F.col(id_col),
                    F.round(cosine_col(F.col(vec_col).cast("array<double>"), q), 6)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


# above this many centroids a literal expression tree would bloat the
# plan (C x dim literals); switch to an Arrow-batched numpy argmin over
# an executor-broadcast centroid matrix — still a narrow pass
_IVF_LITERAL_MAX = 64


def _collect_centroids(embeddings: DataFrame, num_centroids: int,
                       id_col: str, vec_col: str):
    """First ``num_centroids`` vectors by id, sorted by centroid id —
    the deterministic coarse quantizer shared by every IVF operator."""
    rows = (embeddings.orderBy(id_col).limit(num_centroids)
            .select(F.col(id_col).alias("centroid_id"),
                    F.col(vec_col).cast("array<double>").alias("cvec"))
            .collect())
    rows.sort(key=lambda r: r["centroid_id"])
    return rows


def _centroid_array_df(spark, cent_rows) -> DataFrame:
    """ONE-row DataFrame whose single column is the centroid table as
    ``array<struct<cid,cvec>>`` — attached to the embedding scan by a
    broadcast of one row, so the assignment stays a zero-Exchange
    narrow pass.  The former shape inlined C x dim double LITERALS into
    the expression tree; at C=8, dim=64 that is a 512-literal codegen
    method that janino takes seconds to compile on a query's first run
    (the doubles here travel via Arrow instead, bit-exactly)."""
    from drain3_spark.util import local_df
    data = [([(int(r["centroid_id"]), [float(v) for v in r["cvec"]])
              for r in cent_rows],)]
    return local_df(
        spark, data,
        "_cents array<struct<cid:bigint,cvec:array<double>>>")


def assign_ivf_buckets(embeddings: DataFrame, num_centroids: int = 16,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest coarse centroid in ONE NARROW
    PASS — zero Exchange.

    Centroids are the first ``num_centroids`` vectors by id —
    deterministic, no iterative k-means needed for a bucketing layout.
    The centroid table is tiny and bounded, so it is collected once and
    pushed to executors (as a literal array for small C, as a broadcast
    numpy matrix above ``_IVF_LITERAL_MAX``); the argmin happens per row
    with no join and no shuffle.  (The naive broadcast-join + min_by
    formulation materializes N x C rows through an Exchange — a 1024x
    row blowup at C=1024; at 10^12 rows that Exchange IS the job.)
    Ties break to the lowest centroid id in both paths.
    """
    cent_rows = _collect_centroids(embeddings, num_centroids, id_col, vec_col)
    e = embeddings.select(id_col, F.col(vec_col).cast("array<double>").alias("vec"))

    if len(cent_rows) <= _IVF_LITERAL_MAX:
        cents = _centroid_array_df(embeddings.sparkSession, cent_rows)
        scored = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                F.aggregate(F.zip_with(F.col("vec"), c["cvec"],
                                       lambda x, y: (x - y) * (x - y)),
                            F.lit(0.0), lambda acc, v: acc + v).alias("d"),
                c["cid"].alias("cid")))
        # struct min orders by (d, cid): deterministic low-cid tie-break
        return (e.crossJoin(F.broadcast(cents))
                .select(id_col, F.array_min(scored)["cid"].alias("bucket"),
                        "vec"))

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T
    ids = [int(r["centroid_id"]) for r in cent_rows]
    mat = np.asarray([r["cvec"] for r in cent_rows], dtype=np.float64)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, mat))

    @pandas_udf(T.LongType())
    def nearest(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as _np
        cids, cmat = bc.value
        cids = _np.asarray(cids, dtype=_np.int64)
        cnorm = (cmat * cmat).sum(axis=1)
        for series in it:
            X = _np.asarray([list(v) for v in series], dtype=_np.float64)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c drops ||x||^2
            d = cnorm[None, :] - 2.0 * (X @ cmat.T)
            import pandas as _pd
            yield _pd.Series(cids[_np.argmin(d, axis=1)])

    return e.select(id_col, nearest(F.col("vec")).alias("bucket"), "vec")


def assign_ivf_buckets_multiprobe(embeddings: DataFrame,
                                  num_centroids: int = 16, probes: int = 2,
                                  id_col: str = "vec_id",
                                  vec_col: str = "embedding") -> DataFrame:
    """Multi-probe IVF assignment: each vector lands in its ``probes``
    NEAREST coarse buckets — ``(id, probe, bucket, vec)``, one row per
    (vector, probe), still a single narrow pass with zero Exchange
    (same argument as :func:`assign_ivf_buckets`; the explode is a
    per-row generator, not a shuffle).

    This is the SELF-BLOCKING layer for unlabeled corpora: with
    ``probes=1`` a near-dup pair straddling a Voronoi boundary is
    silently lost; replicating every vector into its second-nearest
    bucket recovers exactly the boundary-straddling pairs (both members
    of a close pair have nearly equal distances to their two nearest
    centroids, so the probe sets intersect).  Index blowup is bounded:
    ``probes``× rows, never quadratic.  Ties break to the lowest
    centroid id in both paths, matching the single-probe operator.
    """
    cent_rows = _collect_centroids(embeddings, num_centroids, id_col, vec_col)
    probes = min(probes, len(cent_rows))
    e = embeddings.select(id_col, F.col(vec_col).cast("array<double>").alias("vec"))

    if len(cent_rows) <= _IVF_LITERAL_MAX:
        cents = _centroid_array_df(embeddings.sparkSession, cent_rows)
        scored = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                F.aggregate(F.zip_with(F.col("vec"), c["cvec"],
                                       lambda x, y: (x - y) * (x - y)),
                            F.lit(0.0), lambda acc, v: acc + v).alias("d"),
                c["cid"].alias("cid")))
        # struct sort orders by (d, cid) — the first `probes` entries are
        # the nearest buckets with deterministic low-cid tie-break
        top = F.slice(F.array_sort(scored), 1, probes)
        return (e.crossJoin(F.broadcast(cents))
                .select(id_col, "vec",
                        F.posexplode(top).alias("probe", "_s"))
                .select(id_col, F.col("probe").cast("int").alias("probe"),
                        F.col("_s")["cid"].alias("bucket"), "vec"))

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T
    ids = [int(r["centroid_id"]) for r in cent_rows]
    mat = np.asarray([r["cvec"] for r in cent_rows], dtype=np.float64)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, mat, probes))

    @pandas_udf(T.ArrayType(T.LongType()))
    def nearest_p(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as _np
        import pandas as _pd
        cids, cmat, p = bc.value
        cids = _np.asarray(cids, dtype=_np.int64)
        cnorm = (cmat * cmat).sum(axis=1)
        for series in it:
            X = _np.asarray([list(v) for v in series], dtype=_np.float64)
            d = cnorm[None, :] - 2.0 * (X @ cmat.T)
            # argsort is ascending and stable; cids ascend, so equal
            # distances tie-break to the lowest centroid id
            idx = _np.argsort(d, axis=1, kind="stable")[:, :p]
            yield _pd.Series(list(cids[idx]))

    return (e.select(id_col, "vec", nearest_p(F.col("vec")).alias("_b"))
            .select(id_col, "vec", F.posexplode("_b").alias("probe", "bucket"))
            .select(id_col, F.col("probe").cast("int").alias("probe"),
                    "bucket", "vec"))


def cosine_near_dup_pairs_auto(embeddings: DataFrame, threshold: float = 0.95,
                               num_centroids: int = 16, probes: int = 2,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               method: str = "catalyst") -> DataFrame:
    """Embedding near-duplicate pairs WITHOUT a label column — the
    turnkey shape for a real unlabeled 100-TB embedding corpus:
    :func:`assign_ivf_buckets_multiprobe` supplies the block column,
    then pairs form only within shared buckets (the pair space is
    bounded by the largest bucket, never the corpus) and a pair probed
    into several common buckets is deduplicated by a candidate-bounded
    ``dropDuplicates`` before the cosine is evaluated once.

    Approximate by construction: a pair whose probe sets are disjoint
    is missed.  With ``probes=2`` the boundary-straddling pairs that
    single-probe blocking loses are recovered (measured recall on the
    fixture corpus is pinned by
    ``test_auto_near_dup_multiprobe_recall``); the returned cosines are
    exact and identical to the blocked-brute-force operator, so
    precision is 1 by construction.

    ``method="catalyst"`` (default) evaluates per-pair cosines as pure
    expressions — bit-reproducible against the DuckDB oracle.
    ``method="blas"`` is the scale path: each bucket's pairs come out of
    one Gram-matrix Arrow task (:func:`_blas_pairs_by_block`), then the
    cross-probe duplicates are dropped; same pairs, cosines agree to
    float tolerance (pinned by
    ``test_auto_near_dup_blas_matches_catalyst``).
    """
    assigned = assign_ivf_buckets_multiprobe(embeddings, num_centroids,
                                             probes, id_col, vec_col)
    if method == "blas":
        e = assigned.select(F.col(id_col).alias("id"),
                            F.col("bucket").alias("blk"), "vec")
        return (_blas_pairs_by_block(e, threshold)
                .dropDuplicates(["id_a", "id_b"]))
    # the per-pair cosine below is an interpreted HOF expression: widen
    # a one-partition scan (no-op at scale, see widen_small_scan).
    # Norms are computed once per row (same bit-identical refactor as
    # cosine_near_dup_pairs) so the per-pair work is the dot alone.
    from drain3_spark.util import widen_small_scan
    assigned = widen_small_scan(assigned).withColumn("_nrm",
                                                     _norm(F.col("vec")))
    a = assigned.select(F.col(id_col).alias("id_a"), "bucket",
                        F.col("vec").alias("vec_a"),
                        F.col("_nrm").alias("_nrm_a"))
    b = assigned.select(F.col(id_col).alias("id_b"),
                        F.col("bucket").alias("bucket_b"),
                        F.col("vec").alias("vec_b"),
                        F.col("_nrm").alias("_nrm_b"))
    # Deduplicate cross-probe pairs AFTER the threshold filter, on the
    # slim (id_a, id_b, cosine) rows: the former shape ran
    # dropDuplicates on the raw candidate rows, shuffling every
    # candidate pair WITH both dim-length vectors attached (guide §2.3:
    # shuffle keys, not payloads — measured 736s for this query on a
    # 20k-vector corpus, where ~10^8 candidate pairs x ~1 KB crossed
    # the dedup Exchange).  The threshold is pushed into the join
    # condition, so candidates die inside the join operator and only
    # survivors shuffle; a pair probed into several shared buckets
    # evaluates its dot once per occurrence (bounded by probes²) but
    # every occurrence yields the SAME cosine, so the slim dedup
    # returns the identical row set.
    cosine = F.round(_dot(F.col("vec_a"), F.col("vec_b"))
                     / (F.col("_nrm_a") * F.col("_nrm_b")), 6)
    return (a.join(b, (F.col("bucket") == F.col("bucket_b"))
                   & (F.col("id_a") < F.col("id_b")))
            .withColumn("cosine", cosine)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
            .dropDuplicates(["id_a", "id_b"]))


def ivf_topk(embeddings: DataFrame, query: Sequence[float], k: int = 10,
             num_centroids: int = 16, probes: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style approximate top-k: search only the ``probes`` buckets
    whose centroids are nearest the query."""
    assigned = assign_ivf_buckets(embeddings, num_centroids, id_col, vec_col)
    cents = (embeddings.orderBy(id_col).limit(num_centroids)
             .select(F.col(id_col).alias("centroid_id"),
                     F.col(vec_col).cast("array<double>").alias("cvec")))
    q = _vec_lit(query)
    qdist = F.aggregate(F.zip_with(F.col("cvec"), q, lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda acc, v: acc + v)
    probe_ids = [r["centroid_id"] for r in
                 cents.orderBy(qdist).limit(probes).collect()]
    return (assigned
            .filter(F.col("bucket").isin(probe_ids))
            .select(F.col(id_col),
                    F.round(cosine_col(F.col("vec"), q), 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def _blas_pairs_by_block(e: DataFrame, threshold: float) -> DataFrame:
    """Gram-matrix near-dup pairs within blocks: ONE shuffle groups each
    block's ``(id, blk, vec)`` rows into an Arrow task, numpy computes
    the normalized ``X @ X.T`` (BLAS, dim-vectorized) and emits only
    above-threshold pairs — per-block work is O(n² d) in native code and
    the quadratic intermediate never leaves the task.  The Gram matrix
    is computed in ROW CHUNKS so peak allocation is O(chunk x n), not
    O(n²) — a hot block stays memory-bounded (n=8k with full
    ``triu_indices`` would transiently allocate ~1 GB of index arrays
    alone).  Shared by the labeled (:func:`cosine_near_dup_pairs`),
    self-blocking (:func:`cosine_near_dup_pairs_auto`), and audio
    (:func:`drain3_spark.pipeline.audio_sim.audio_near_dup_pairs`)
    operators."""
    import numpy as np
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])
    th = float(threshold)

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        # Arrow hands vec as an object column of ndarrays: stack, don't
        # round-trip through python lists (measured: the list conversion
        # dominated the task at 1e5 x 64-dim blocks)
        X = np.stack(pdf["vec"].to_numpy()[order]).astype(np.float64,
                                                          copy=False)
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1.0
        Xn = X / norms[:, None]
        n = len(ids)
        chunk = 1024
        ia, ib, cs = [], [], []
        for i0 in range(0, n - 1, chunk):
            i1 = min(i0 + chunk, n)
            S = np.round(Xn[i0:i1] @ Xn.T, 6)        # (chunk, n)
            # strict upper triangle of this row band: j > row index
            jgrid = np.arange(n)[None, :]
            igrid = np.arange(i0, i1)[:, None]
            keep = (S >= th) & (jgrid > igrid)
            ii, jj = np.nonzero(keep)
            ia.append(ids[ii + i0])
            ib.append(ids[jj])
            cs.append(S[ii, jj])
        if not ia:
            return pd.DataFrame({"id_a": np.array([], "int64"),
                                 "id_b": np.array([], "int64"),
                                 "cosine": np.array([], "float64")})
        return pd.DataFrame({"id_a": np.concatenate(ia).astype("int64"),
                             "id_b": np.concatenate(ib).astype("int64"),
                             "cosine": np.concatenate(cs)})

    return e.groupBy("blk").applyInPandas(block_pairs, out_schema)


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                          block_col: str = "label", id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          method: str = "catalyst") -> DataFrame:
    """Embedding near-duplicate pairs within blocks: the block column
    bounds the pair space (label, LSH bucket, or IVF bucket).

    ``method="catalyst"`` (default) is the pure-expression self-join —
    bit-reproducible against the DuckDB oracle (sequential double sums).
    ``method="blas"`` is the scale path: ONE shuffle groups each block
    into an Arrow task, numpy computes the normalized Gram matrix
    (X @ X.T — BLAS, dim-vectorized) and emits only above-threshold
    pairs; per-block work is O(n² d) in native code instead of
    interpreted expressions, and the quadratic intermediate never
    leaves the task.  Same pairs; cosines agree to float tolerance.
    """
    e = embeddings.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk"),
                          F.col(vec_col).cast("array<double>").alias("vec"))
    if method == "blas":
        return _blas_pairs_by_block(e, threshold)

    # the per-pair cosine below is a HOF expression (interpreted, see
    # PLANS.md): widen the probe side so a one-partition scan doesn't
    # serialize every pair's dot product onto a single task
    from drain3_spark.util import widen_small_scan
    e = widen_small_scan(e)
    # norms are per-ROW quantities: compute them once on each join input
    # instead of re-running the two norm aggregates inside every pair's
    # cosine (the planner pushes the threshold into the join condition,
    # so each candidate pair was evaluating dot + 2 norms there and
    # again in the output projection — 6 interpreted O(dim) folds per
    # pair; now it is the dot alone).  dot/(norm_a*norm_b) over the SAME
    # doubles is bit-identical to the inlined expression — no float
    # reassociation, so the rounded cosine (and the oracle hash) cannot
    # move.
    e = e.withColumn("_nrm", _norm(F.col("vec")))
    a = e.select(F.col("id").alias("id_a"), "blk", F.col("vec").alias("vec_a"),
                 F.col("_nrm").alias("_nrm_a"))
    b = e.select(F.col("id").alias("id_b"), F.col("blk").alias("blk_b"),
                 F.col("vec").alias("vec_b"), F.col("_nrm").alias("_nrm_b"))
    return (a.join(b, (F.col("blk") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
            .withColumn("cosine",
                        F.round(_dot(F.col("vec_a"), F.col("vec_b"))
                                / (F.col("_nrm_a") * F.col("_nrm_b")), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))
