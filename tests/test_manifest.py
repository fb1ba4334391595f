"""Corpus manifest: full cross-engine (DuckDB) replay of every column
including the histograms, plus the referential-coverage join."""

import duckdb
import numpy as np

from drain3_spark import fixtures as FX


def test_manifest_matches_duckdb(spark, tmp_path):
    from drain3_spark.pipeline.manifest import corpus_manifest

    clips = FX.gen_clips(spark, 250, dirty=True, partitions=8)
    # plant a null-duration row: it must stay OUT of the chars/sec
    # average (greatest(dur_ms,1) used to turn it into chars/0.001s)
    from pyspark.sql import functions as F
    planted = (clips.limit(1)
               .withColumn("clip_id", F.lit("null-dur"))
               .withColumn("dur_ms", F.lit(None).cast("int"))
               .withColumn("transcript", F.lit("x" * 500)))
    clips = clips.unionByName(planted)
    ref = FX.gen_transcripts_ref(spark, 200, dirty=True)
    cpath, rpath = str(tmp_path / "clips"), str(tmp_path / "ref")
    clips.write.parquet(cpath)
    ref.write.parquet(rpath)

    got = corpus_manifest(spark.read.parquet(cpath),
                          spark.read.parquet(rpath)).collect()

    con = duckdb.connect()
    want = {r[0]: r for r in con.execute(f"""
        with c as (select * from '{cpath}/*.parquet'),
        base as (
          select ds, count(*) n, count(distinct clip_id) ids,
                 cast(sum(octet_length(bytes)) as bigint) pb,
                 min(dur_ms) dmin, max(dur_ms) dmax,
                 round(avg(dur_ms), 4) davg,
                 cast(sum(case when transcript is null then 1 else 0 end)
                      as bigint) nn,
                 round(avg(length(transcript)), 4) tc,
                 round(avg(case when dur_ms > 0 then
                           length(transcript) * 1000.0 / dur_ms
                           end), 4) cps
          from c group by ds),
        ch as (select ds, list((codec, n) order by codec) h from
               (select ds, codec, count(*) n from c group by 1, 2)
               group by ds),
        sh as (select ds, list((sr_hz, n) order by sr_hz) h from
               (select ds, sr_hz, count(*) n from c group by 1, 2)
               group by ds),
        cov as (select ds, count(*) nref from c
                where clip_id in (select clip_id
                                  from '{rpath}/*.parquet')
                group by ds)
        select base.*, ch.h, sh.h,
               coalesce(cov.nref, 0)
        from base join ch using (ds) join sh using (ds)
        left join cov using (ds)""").fetchall()}

    assert len(got) == len(want) > 1
    for r in got:
        w = want[r.ds]
        assert (r.n_clips, r.n_distinct_ids, r.payload_bytes,
                r.dur_ms_min, r.dur_ms_max, r.n_null_transcript,
                r.n_with_ref) == (w[1], w[2], w[3], w[4], w[5], w[7],
                                  w[12]), r.ds
        assert abs(r.dur_ms_avg - w[6]) < 1e-6
        assert (r.avg_transcript_chars is None) == (w[8] is None)
        if r.avg_transcript_chars is not None:
            assert abs(r.avg_transcript_chars - w[8]) < 1e-6
            assert abs(r.avg_chars_per_sec - w[9]) < 1e-6
        assert [(x.codec, x.n) for x in r.codec_histogram] == \
            [(c, n) for c, n in w[10]], r.ds
        assert [(x.sr_hz, x.n) for x in r.sr_histogram] == \
            [(s, n) for s, n in w[11]], r.ds


def test_manifest_histograms_bounded_and_deterministic(spark):
    from drain3_spark.pipeline.manifest import corpus_manifest

    clips = FX.gen_clips(spark, 120, dirty=False)
    a = corpus_manifest(clips.repartition(7)).collect()
    b = corpus_manifest(clips.coalesce(1)).collect()
    assert [r.asDict(True) for r in a] == [r.asDict(True) for r in b]
    for r in a:
        assert r.n_clips == sum(x.n for x in r.codec_histogram)
        assert r.n_clips == sum(x.n for x in r.sr_histogram)
