"""Pure-numpy audio codecs.

The payload-validation check (BASELINE.json input_hint / SURVEY.md C8)
decodes ``bytes`` per ``codec`` into float32 PCM inside batched Arrow
UDFs and asserts SNR >= 30 dB against the regenerated reference signal.
No external audio libraries exist in this sandbox, so the four codecs
are implemented directly:

* ``pcm_s16le`` / ``pcm_f32le`` — linear little-endian PCM
* ``mulaw`` / ``alaw`` — ITU-T G.711 companding (continuous-formula
  variant; encode/decode are exact inverses up to 8-bit quantization,
  which keeps sine+noise SNR well above the 30 dB gate)

All functions are vectorized over whole clips (no per-sample Python).
"""

from __future__ import annotations

import numpy as np

MU = 255.0
A_LAW = 87.6

CODECS = ("pcm_s16le", "pcm_f32le", "mulaw", "alaw",
          # exact ITU-T G.711 segmented companding — bit-compatible
          # with real telephony bytes (RTP PCMU/PCMA), unlike the
          # continuous-formula mulaw/alaw above (drain3_spark.audio.g711)
          "g711_mulaw", "g711_alaw")

# container codecs: the payload is a self-describing RIFF/WAVE file
# (inner format after the colon; bare "wav" means pcm_s16le).  The
# container carries its OWN sample rate — wav.decode_wav returns it so
# validation can cross-check it against the table's sr_hz column.
WAV_CODECS = ("wav", "wav:pcm_s16le", "wav:pcm_f32le", "wav:mulaw",
              "wav:alaw", "wav:adpcm_ima")
# all self-describing containers (carry their own sample rate)
CONTAINER_CODECS = WAV_CODECS + ("flac",)


def _clip(x: np.ndarray) -> np.ndarray:
    return np.clip(x, -1.0, 1.0)


def encode(pcm: np.ndarray, codec: str, sr_hz: int = 16000) -> bytes:
    if codec == "flac":
        from drain3_spark.audio.flac import encode_flac
        return encode_flac(np.asarray(pcm, dtype=np.float32), sr_hz)
    if codec.startswith("wav"):
        from drain3_spark.audio.wav import encode_wav
        inner = codec.split(":", 1)[1] if ":" in codec else "pcm_s16le"
        return encode_wav(np.asarray(pcm, dtype=np.float32), sr_hz, inner)
    if codec == "g711_mulaw":
        from drain3_spark.audio.g711 import encode_mulaw_g711
        return encode_mulaw_g711(np.asarray(pcm, dtype=np.float32))
    if codec == "g711_alaw":
        from drain3_spark.audio.g711 import encode_alaw_g711
        return encode_alaw_g711(np.asarray(pcm, dtype=np.float32))
    x = _clip(np.asarray(pcm, dtype=np.float32))
    if codec == "pcm_s16le":
        return (np.round(x * 32767.0).astype("<i2")).tobytes()
    if codec == "pcm_f32le":
        return x.astype("<f4").tobytes()
    if codec == "mulaw":
        y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
        q = np.round((y + 1.0) * 127.5).astype(np.uint8)
        return q.tobytes()
    if codec == "alaw":
        ax = np.abs(x)
        y = np.where(ax < 1.0 / A_LAW,
                     A_LAW * ax / (1.0 + np.log(A_LAW)),
                     (1.0 + np.log(A_LAW * np.maximum(ax, 1.0 / A_LAW)))
                     / (1.0 + np.log(A_LAW)))
        y = np.sign(x) * y
        q = np.round((y + 1.0) * 127.5).astype(np.uint8)
        return q.tobytes()
    raise ValueError(f"unknown codec: {codec}")


def _expand_table(codec: str) -> np.ndarray:
    """256-entry expansion LUT for the 8-bit companded codecs: the
    transcendental expansion runs once per possible code, decode becomes
    a table gather (~10x faster than per-sample pow/exp)."""
    codes = np.arange(256, dtype=np.float32)
    y = codes / 127.5 - 1.0
    if codec == "mulaw":
        x = np.sign(y) * (np.power(1.0 + MU, np.abs(y)) - 1.0) / MU
    else:  # alaw
        ay = np.abs(y)
        knee = 1.0 / (1.0 + np.log(A_LAW))
        x = np.where(ay < knee,
                     ay * (1.0 + np.log(A_LAW)) / A_LAW,
                     np.exp(ay * (1.0 + np.log(A_LAW)) - 1.0) / A_LAW)
        x = np.sign(y) * x
    return x.astype(np.float32)


_MULAW_LUT = _expand_table("mulaw")
_ALAW_LUT = _expand_table("alaw")


def decode(payload: bytes, codec: str) -> np.ndarray:
    if codec == "flac":
        from drain3_spark.audio.flac import decode_flac
        return decode_flac(payload)[0]
    if codec.startswith("wav"):
        from drain3_spark.audio.wav import decode_wav
        return decode_wav(payload)[0]
    if codec == "pcm_s16le":
        return np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32767.0
    if codec == "pcm_f32le":
        return np.frombuffer(payload, dtype="<f4").astype(np.float32)
    if codec == "mulaw":
        return _MULAW_LUT[np.frombuffer(payload, dtype=np.uint8)]
    if codec == "alaw":
        return _ALAW_LUT[np.frombuffer(payload, dtype=np.uint8)]
    if codec == "g711_mulaw":
        from drain3_spark.audio.g711 import decode_mulaw_g711
        return decode_mulaw_g711(payload)
    if codec == "g711_alaw":
        from drain3_spark.audio.g711 import decode_alaw_g711
        return decode_alaw_g711(payload)
    raise ValueError(f"unknown codec: {codec}")


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of ``decoded`` against ``reference`` in dB;
    -inf on length mismatch or degenerate input."""
    if reference.shape != decoded.shape or reference.size == 0:
        return float("-inf")
    err = np.sum((reference.astype(np.float64) - decoded.astype(np.float64)) ** 2)
    sig = np.sum(reference.astype(np.float64) ** 2)
    if err == 0.0:
        return float("inf")
    if sig == 0.0:
        return float("-inf")
    return float(10.0 * np.log10(sig / err))
