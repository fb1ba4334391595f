"""Audio payload validation (SURVEY.md C8, BASELINE.json per-row invariant).

Decode ``bytes`` per ``codec`` into PCM inside a batched Arrow
``mapInPandas`` UDF — no per-row Python crossing the JVM boundary, one
Arrow batch per few thousand clips (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` because payloads are
large) — and assert SNR >= ``snr_min`` dB against the reference signal
regenerated from ``clip_id`` (drain3_spark.audio.synth).

Only structurally valid rows are decodable (legal codec, sr in domain,
dur in bounds); the others are already their own checks' findings, so
they are filtered out *before* the scan — Catalyst prunes every column
except the five this check needs.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from drain3_spark.fixtures import CHECK_AUDIO_DECODE

AUDIO_RESULT_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("ds", T.StringType()),
    T.StructField("snr_db", T.DoubleType()),
    T.StructField("passed", T.BooleanType()),
])


def audio_decode_results(clips: DataFrame,
                         snr_min: float = 30.0,
                         dur_bounds: Tuple[int, int] = (100, 5000),
                         sr_domain: Sequence[int] = (8000, 16000, 22050, 44100, 48000),
                         ) -> DataFrame:
    """Per-clip (snr_db, passed) for structurally valid rows."""
    from drain3_spark.audio.codecs import CODECS
    from drain3_spark.shipping import ship_package
    ship_package(clips.sparkSession)

    lo, hi = dur_bounds
    valid = (clips
             .filter(F.col("codec").isin(*CODECS)
                     & F.col("sr_hz").isin(*[int(s) for s in sr_domain])
                     & F.col("dur_ms").between(lo, hi)
                     & F.col("bytes").isNotNull())
             .select("clip_id", "ds", "bytes", "sr_hz", "dur_ms", "codec"))

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drain3_spark.audio.codecs import decode, snr_db
        from drain3_spark.audio.synth import reference_pcm
        for b in batches:
            snrs, oks = [], []
            for cid, payload, sr, dur, codec in zip(
                    b["clip_id"], b["bytes"], b["sr_hz"], b["dur_ms"], b["codec"]):
                try:
                    got = decode(bytes(payload), codec)
                    ref = reference_pcm(cid, int(sr), int(dur))
                    s = snr_db(ref, got)
                except Exception:
                    s = float("-inf")
                snrs.append(s)
                oks.append(bool(s >= snr_min))
            yield pd.DataFrame({"clip_id": b["clip_id"], "ds": b["ds"],
                                "snr_db": snrs, "passed": oks})

    return valid.mapInPandas(check, AUDIO_RESULT_SCHEMA)


def audio_violations(clips: DataFrame, snr_min: float = 30.0,
                     dur_bounds: Tuple[int, int] = (100, 5000),
                     sr_domain: Sequence[int] = (8000, 16000, 22050, 44100, 48000),
                     ) -> DataFrame:
    res = audio_decode_results(clips, snr_min, dur_bounds, sr_domain)
    return (res.filter(~F.col("passed"))
            .select("clip_id", "ds",
                    F.lit(CHECK_AUDIO_DECODE).alias("check"),
                    F.lit(f"snr below {snr_min} dB").alias("detail"))
            .distinct())
