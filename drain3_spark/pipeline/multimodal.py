"""Multimodal (binary-payload) processing plumbing.

Pattern: opaque ``binary`` column + typed metadata columns; decode /
feature-extract / resize / frame-sample run as batched Arrow
``mapInPandas`` UDFs with bounded batch sizes (binary payloads dominate
Arrow batch memory — ``spark.sql.execution.arrow.maxRecordsPerBatch``).

Audio is REAL end-to-end here (drain3_spark.audio implements the
codecs).  Image decode and video frame-sampling are STUBS: the
decoding libraries are not in this container, so ``decode_image`` /
``sample_video_frames`` raise ``NotImplementedError`` unless the
deterministic fake decoder is requested — the Spark-side plumbing
(schema, batching, UDF signature, partitioning) is real and tested
either way.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zero_crossings", T.IntegerType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("item_id", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("histogram", T.ArrayType(T.DoubleType())),  # 16-bin byte hist
])


def audio_features(clips: DataFrame) -> DataFrame:
    """Real decode → per-clip acoustic features (RMS, peak, ZCR)."""
    from drain3_spark.shipping import ship_package
    ship_package(clips.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from drain3_spark.audio.codecs import decode
        for b in batches:
            out = []
            for cid, payload, sr, codec in zip(b["clip_id"], b["bytes"],
                                               b["sr_hz"], b["codec"]):
                try:
                    pcm = decode(bytes(payload), codec)
                except Exception:
                    out.append((cid, 0, 0.0, 0.0, 0.0, 0))
                    continue
                n = len(pcm)
                zc = int(np.count_nonzero(np.diff(np.signbit(pcm)))) if n > 1 else 0
                out.append((cid, n, n / float(sr) if sr else 0.0,
                            float(np.sqrt(np.mean(pcm ** 2))) if n else 0.0,
                            float(np.max(np.abs(pcm))) if n else 0.0, zc))
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    return (clips.select("clip_id", "bytes", "sr_hz", "codec")
            .mapInPandas(extract, AUDIO_FEATURES_SCHEMA))


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: no image decoding library in this container.  On a real
    deployment this is Pillow/torchvision inside the same mapInPandas
    shape as :func:`audio_features`."""
    raise NotImplementedError("image decoding requires an image library; "
                              "use fake_decoder=True for plumbing tests")


def image_features(items: DataFrame, id_col: str = "item_id",
                   payload_col: str = "payload",
                   fake_decoder: bool = False) -> DataFrame:
    """Feature extraction over opaque image bytes.

    ``fake_decoder=True`` substitutes a deterministic byte-histogram
    'decoder' so the distributed plumbing is exercised end-to-end."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, sizes, hists = [], [], []
            for iid, payload in zip(b[id_col], b[payload_col]):
                raw = bytes(payload)
                if not fake_decoder:
                    decode_image(raw)  # raises NotImplementedError
                arr = np.frombuffer(raw, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
                total = hist.sum() or 1.0
                ids.append(iid)
                sizes.append(len(raw))
                hists.append(list(hist / total))
            yield pd.DataFrame({"item_id": ids, "n_bytes": sizes,
                                "histogram": hists})

    return (items.select(F.col(id_col), F.col(payload_col))
            .mapInPandas(extract, IMAGE_FEATURES_SCHEMA))


def sample_video_frames(*args, **kwargs):  # pragma: no cover - stub by design
    """STUB: video frame sampling needs a video decoder; the distributed
    shape is identical to :func:`image_features` with one output row per
    (item, frame_idx)."""
    raise NotImplementedError("video decoding requires a media library")
