"""Corpus manifest (dataset card) — the one-row-per-partition summary
a training-data pipeline publishes next to the data: volume, payload
and codec/sample-rate composition, duration and transcript statistics.
The north-star column stats (null rates, min/max dur_ms, codec/sr
frequency histograms) rolled into a single publishable table, per ds.

Pure Catalyst: one narrow scan feeding three partial-aggregated
``groupBy`` passes (scalar stats, codec histogram, sr histogram) that
join on the tiny per-ds result — at 10^12 rows each shuffle moves a
few hundred aggregate rows, never data.  Histograms are
``sort_array(collect_list(struct(...)))`` so output is deterministic
and engine-comparable; bounded by construction (codec/sr domains are
small — for an unbounded column use the drift cube's bucketing
instead).  Every column is DuckDB-expressible; the test replays the
whole manifest cross-engine.

The reference (/root/reference/drain3) has no corpus-summary surface;
this packages SURVEY §2.C's column stats (C2) as a publishable
artifact.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def corpus_manifest(clips: DataFrame,
                    transcripts_ref: Optional[DataFrame] = None) -> DataFrame:
    """One row per ``ds``: counts, distinct ids, payload bytes, dur_ms
    min/max/avg, codec and sr_hz histograms, transcript null count and
    length/rate means.  With ``transcripts_ref``, adds the referential
    coverage count (clips whose id exists in the reference)."""
    # NULL (and non-positive) dur_ms must stay out of the rate average:
    # greatest() skips nulls, so greatest(dur_ms, 1) would turn a
    # null-duration row into chars/0.001s and poison the published stat
    chars_per_sec = F.when(F.col("dur_ms") > 0,
                           F.length("transcript") * 1000.0
                           / F.col("dur_ms"))
    base = (clips.groupBy("ds").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.countDistinct("clip_id").alias("n_distinct_ids"),
        F.sum(F.length("bytes")).alias("payload_bytes"),
        F.min("dur_ms").alias("dur_ms_min"),
        F.max("dur_ms").alias("dur_ms_max"),
        F.round(F.avg("dur_ms"), 4).alias("dur_ms_avg"),
        F.sum(F.col("transcript").isNull().cast("long"))
         .alias("n_null_transcript"),
        F.round(F.avg(F.length("transcript")), 4)
         .alias("avg_transcript_chars"),
        F.round(F.avg(chars_per_sec), 4).alias("avg_chars_per_sec"),
    ))
    codec_h = (clips.groupBy("ds", "codec")
               .agg(F.count(F.lit(1)).alias("n"))
               .groupBy("ds")
               .agg(F.sort_array(F.collect_list(F.struct("codec", "n")))
                    .alias("codec_histogram")))
    sr_h = (clips.groupBy("ds", "sr_hz")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("ds")
            .agg(F.sort_array(F.collect_list(F.struct("sr_hz", "n")))
                 .alias("sr_histogram")))
    out = base.join(codec_h, "ds").join(sr_h, "ds")
    if transcripts_ref is not None:
        cov = (clips.join(transcripts_ref.select("clip_id").distinct(),
                          "clip_id", "left_semi")
               .groupBy("ds").agg(F.count(F.lit(1)).alias("n_with_ref")))
        out = out.join(cov, "ds", "left") \
            .withColumn("n_with_ref", F.coalesce("n_with_ref", F.lit(0)))
    return out.orderBy("ds")
