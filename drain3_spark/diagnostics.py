"""Diagnostic report queries (reference A17/A18 analogs).

``cluster_tree_report`` is the relational analog of the reference's
``print_tree`` debug dump (drain3/drain.py:152-179): one row per mining
group with cluster count, total assigned size, and the top templates.
``profile_report`` mirrors the profiler's sorted per-section table
(drain3/simple_profiler.py:101-155) over the engine's metrics rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cluster_tree_report(clusters: DataFrame, max_clusters: int = 5) -> DataFrame:
    """Per-group cluster summary, largest groups first
    (reference drain3/drain.py:152-179, default max_clusters=5)."""
    return (clusters
            .groupBy("group_key")
            .agg(F.count(F.lit(1)).alias("cluster_count"),
                 F.sum("size").alias("total_size"),
                 F.slice(F.reverse(F.array_sort(F.collect_list(
                     F.struct(F.col("size").alias("size"),
                              F.col("template").alias("template"))))),
                         1, max_clusters).alias("top_clusters"))
            .orderBy(F.desc("total_size")))


def profile_report(metrics: DataFrame) -> DataFrame:
    """Partition-level throughput table sorted by violation share
    (the reference sorts profiler sections by took%,
    drain3/simple_profiler.py:114)."""
    total = metrics.agg(F.sum("rows_scanned")).first()[0] or 1
    return (metrics
            .withColumn("rows_share",
                        F.round(F.col("rows_scanned") / F.lit(float(total)), 6))
            .orderBy(F.desc("violations"), "ds"))
