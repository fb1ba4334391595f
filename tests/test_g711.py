"""Exact ITU-T G.711 segmented companding: all-256-code encode/decode
involution per law, spec extrema, monotonicity, divergence from the
continuous-formula codecs, and the codecs.py dispatch."""

import numpy as np

from drain3_spark.audio.codecs import decode, encode
from drain3_spark.audio.g711 import (_A_LUT, _MU_LUT, decode_alaw_g711,
                                     decode_mulaw_g711, encode_alaw_g711,
                                     encode_mulaw_g711)


def test_all_codes_roundtrip_mu():
    """decode emits each quantization interval's midpoint, so
    re-encoding every decoded code must return the same byte — for all
    256 codes except 0x7F (negative zero, which the spec itself folds
    into positive zero 0xFF)."""
    for i in range(256):
        back = encode_mulaw_g711(_MU_LUT[i:i + 1])[0]
        if i == 0x7F:
            assert back == 0xFF
        else:
            assert back == i, i


def test_all_codes_roundtrip_a():
    for i in range(256):
        assert encode_alaw_g711(_A_LUT[i:i + 1])[0] == i, i


def test_spec_extrema_and_zero():
    # mu-law: 14-bit lattice, max interval midpoint 8031; +0 is 0xFF
    assert round(float(_MU_LUT.max()) * 8159) == 8031
    assert round(float(_MU_LUT.min()) * 8159) == -8031
    assert encode_mulaw_g711(np.zeros(1))[0] == 0xFF
    assert _MU_LUT[0xFF] == 0.0
    # A-law: 13-bit lattice, max midpoint 4032; 256 distinct values
    # (A-law has no double zero)
    assert round(float(_A_LUT.max()) * 4096) == 4032
    assert round(float(_A_LUT.min()) * 4096) == -4032
    assert len(np.unique(_A_LUT)) == 256
    assert len(np.unique(_MU_LUT)) == 255  # +-0 fold


def test_encode_monotone():
    """A finer input never encodes to a coarser-side code: decoded
    values of encoded ramps are non-decreasing."""
    x = np.linspace(-1.0, 1.0, 20001)
    for enc, dec in ((encode_mulaw_g711, decode_mulaw_g711),
                     (encode_alaw_g711, decode_alaw_g711)):
        y = dec(enc(x))
        assert np.all(np.diff(y) >= 0)
        # quantization error bounded by half the local segment step
        assert np.max(np.abs(y - x)) < 0.032


def test_differs_from_continuous_formula():
    """The segmented tables are NOT the continuous textbook formula —
    the whole point of the interop codecs: same bytes, different
    samples."""
    rng = np.random.default_rng(11)
    x = (0.5 * rng.uniform(-1, 1, 4000)).astype(np.float32)
    for g, cont in (("g711_mulaw", "mulaw"), ("g711_alaw", "alaw")):
        payload = encode(x, g)
        assert not np.allclose(decode(payload, g), decode(payload, cont),
                               atol=1e-4)


def test_codecs_dispatch_and_snr():
    fs = 16000
    t = np.arange(2 * fs) / fs
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    for codec in ("g711_mulaw", "g711_alaw"):
        y = decode(encode(x, codec), codec)
        snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - y) ** 2))
        assert snr > 33.0, (codec, snr)  # comfortably above the 30 dB gate


def test_g711_rides_validation_matrix(spark):
    """The extended codec matrix (now incl. g711_mulaw/g711_alaw) runs
    through the full decode+SNR validation with zero violations on a
    clean corpus."""
    from drain3_spark import fixtures as FX
    from drain3_spark.validation.audio import audio_decode_results

    clips = FX.gen_clips_wav(spark, 130, sr_mismatch_every=10 ** 9)
    rows = audio_decode_results(clips).collect()
    codecs_seen = {r.clip_id for r in rows}
    assert len(rows) == 130
    assert all(r.passed for r in rows), [r for r in rows if not r.passed][:3]
    # both new codecs actually appeared in the corpus
    metas = {FX.CODEC_MATRIX[i % len(FX.CODEC_MATRIX)] for i in range(130)}
    assert {"g711_mulaw", "g711_alaw"} <= metas and codecs_seen


_SEG_AEND = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]


def _ref_linear2alaw(pcm13: int) -> int:
    """Scalar transcription of the classic public G.711 A-law encoder
    (CCITT reference shape): one's-complement negatives, segment table
    search, alternate-bit inversion."""
    if pcm13 >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm13 = -pcm13 - 1
    pcm13 = min(pcm13, 0xFFF)
    seg = 8
    for i, b in enumerate(_SEG_AEND):
        if pcm13 <= b:
            seg = i
            break
    if seg < 2:
        aval = (seg << 4) | ((pcm13 >> 1) & 0xF)
    else:
        aval = (seg << 4) | ((pcm13 >> seg) & 0xF)
    return aval ^ mask


def test_alaw_encode_exhaustive_vs_reference():
    """Every 13-bit input encodes to the same byte as the reference
    algorithm — including the negative segment-edge values the
    one's-complement handles (127 bytes differed before the fix)."""
    vals = np.arange(-4096, 4096)
    got = np.frombuffer(encode_alaw_g711(vals / 4096.0), dtype=np.uint8)
    want = np.array([_ref_linear2alaw(int(v)) for v in vals])
    np.testing.assert_array_equal(got, want)
