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
