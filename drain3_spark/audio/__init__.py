from drain3_spark.audio.codecs import decode, encode, CODECS, snr_db
from drain3_spark.audio.synth import reference_pcm, clip_params

__all__ = ["decode", "encode", "CODECS", "snr_db", "reference_pcm", "clip_params"]
