"""Jaccard engine through the distributed mining path."""

from pyspark.sql import functions as F

from drain3_spark.config import EngineConfig
from drain3_spark.operators.matching import match_clusters
from drain3_spark.operators.mining import mine_templates

LINES = [
    "check pass; user unknown",
    "check pass; user Lisa",
    "check pass; user li Sa",
    "session opened for user cyrus by (uid=0)",
    "session closed for user cyrus",
]


def test_jaccard_spark_mining_and_match(spark):
    df = spark.createDataFrame(
        [("2026-08-01", f"clip-{i:010d}", t) for i, t in enumerate(LINES)],
        "ds string, clip_id string, transcript string")
    cfg = EngineConfig(engine="jaccard")
    res = mine_templates(df, cfg)
    clusters = {r.cluster_id: r for r in res.clusters.collect()}
    # variable-length merging: all three "check pass" lines share cluster 1
    got = {r.clip_id: r.cluster_id for r in res.assignments.collect()}
    assert got["clip-0000000000"] == got["clip-0000000001"] == got["clip-0000000002"] == 1
    # jaccard group key = first token; both "session ..." lines share a group
    state = [tuple(r) for r in res.clusters.collect()]
    probe = spark.createDataFrame(
        [("2026-08-02", "p-0", "check pass; user boris"),
         ("2026-08-02", "p-1", "session opened for user cyrus by (uid=1)"),
         ("2026-08-02", "p-2", "nothing")],
        "ds string, clip_id string, transcript string")
    m = {r.clip_id: r.matched_cluster_id
         for r in match_clusters(probe, state, cfg, strategy="never").collect()}
    assert m["p-0"] == 1
    assert m["p-1"] == 2
    assert m["p-2"] is None
    res.unpersist()


def test_q29_kernel_equals_sql_formulation(spark):
    """q29 grades the Arrow-kernel jaccard match (the measured-fast
    path); its result must equal the pure-Catalyst broadcast-join
    formulation aggregated identically over the same corpus."""
    import os

    import pytest
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("driver testdata not present")
    import __spark_entry__ as entry
    from drain3_spark.operators.matching import match_clusters_sql_jaccard

    kernel = {(r.matched_cluster_id, r.n_docs)
              for r in entry._q29_jaccard_match(spark, sf).collect()}
    cfg = EngineConfig(engine="jaccard")
    clips = entry._docs_as_clips(spark, sf)
    res = entry._mined(spark, sf, engine="jaccard")
    sql = {(r.matched_cluster_id, r.n_docs)
           for r in (match_clusters_sql_jaccard(clips, res.clusters, cfg)
                     .groupBy("matched_cluster_id")
                     .agg(F.count(F.lit(1)).alias("n_docs"))).collect()}
    assert kernel == sql
    assert len(kernel) > 1


def test_jaccard_sql_match_equals_kernel(spark):
    """Bulk SQL jaccard inference (broadcast first-token join +
    array_intersect/union sim, 1.3 gain, 0.8 gate) must match the
    kernel 'always' path row-for-row on the golden corpus."""
    from drain3_spark.operators.matching import match_clusters_sql_jaccard
    from drain3_spark.operators.mining import CLUSTER_SCHEMA

    corpus = LINES + [
        "check fail; user unknown",
        "disk /dev/sda1 is 97% full",
        "disk /dev/sdb2 is 13% full",
        "backup finished ok",
        "backup finished with 3 warnings now",
    ]
    df = spark.createDataFrame(
        [("2026-08-01", f"clip-{i:010d}", t) for i, t in enumerate(corpus)],
        "ds string, clip_id string, transcript string")
    cfg = EngineConfig(engine="jaccard")
    res = mine_templates(df, cfg)
    state = [tuple(r) for r in res.clusters.collect()]
    clusters_df = spark.createDataFrame(state, CLUSTER_SCHEMA)

    probes = corpus + [
        "check pass; user zeta",
        "session opened for user root by (uid=9)",
        "disk /dev/sdc3 is 55% full",
        "backup finished ok today",
        "completely different line with no anchor",
        "",
    ]
    probe = spark.createDataFrame(
        [("2026-08-02", f"p-{i:04d}", t) for i, t in enumerate(probes)],
        "ds string, clip_id string, transcript string")

    want = {r.clip_id: r.matched_cluster_id
            for r in match_clusters(probe, state, cfg, strategy="always").collect()}
    got_df = match_clusters_sql_jaccard(probe, clusters_df, cfg)
    got = {r.clip_id: r.matched_cluster_id for r in got_df.collect()}
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    # at least one real match and one null in the comparison
    assert any(v is not None for v in want.values())
    assert any(v is None for v in want.values())
    # big side never shuffles: broadcast join only
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    res.unpersist()
