"""WebP lossless (VP8L): round-trip matrix over every encoder feature,
plus container/stub behavior and the Spark-path dispatch."""

import numpy as np
import pytest

from drain3_spark.pipeline.webp import (decode_webp, encode_webp_lossless,
                                        encode_webp_palette)


def _rng():
    return np.random.default_rng(20260817)


def test_roundtrip_feature_matrix():
    rng = _rng()
    for (h, w) in [(1, 1), (3, 5), (16, 16), (33, 17)]:
        for sg in (True, False):
            for lz in (True, False):
                for cb in (0, 6):
                    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    p = encode_webp_lossless(img, subtract_green=sg,
                                             use_lz77=lz, cache_bits=cb)
                    assert np.array_equal(decode_webp(p), img), (h, w, sg,
                                                                 lz, cb)


def test_roundtrip_all_predictor_modes():
    rng = _rng()
    smooth = np.cumsum(rng.integers(-3, 4, (24, 31, 3)), axis=0)
    smooth = np.clip(smooth + 128, 0, 255).astype(np.uint8)
    for mode in range(14):
        for img in (rng.integers(0, 256, (9, 7, 3), dtype=np.uint8),
                    smooth):
            p = encode_webp_lossless(img, subtract_green=(mode % 2 == 0),
                                     predictor_mode=mode)
            assert np.array_equal(decode_webp(p), img), f"mode {mode}"


def test_roundtrip_palettes_incl_bundling():
    rng = _rng()
    for nc in (2, 3, 5, 14, 17, 200):
        base = rng.integers(0, 256, (nc, 3), dtype=np.uint8)
        img = base[rng.integers(0, nc, (13, 29))]
        p = encode_webp_palette(img)
        assert np.array_equal(decode_webp(p), img), f"{nc} colors"


def test_compression_is_real():
    """Flat/repetitive content must compress far below raw size (LZ77 +
    cache actually doing work, not just a valid container)."""
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 8:56] = (200, 30, 99)
    img[::4] = (1, 2, 3)
    p = encode_webp_lossless(img)
    assert len(p) < 64 * 64 * 3 // 10


def test_container_and_stub_behavior():
    img = _rng().integers(0, 256, (4, 4, 3), dtype=np.uint8)
    p = bytearray(encode_webp_lossless(img))
    with pytest.raises(ValueError):
        decode_webp(b"NOPE" + bytes(p[4:]))
    # lossy chunk tag -> declared stub
    lossy = bytes(p[:12]) + b"VP8 " + bytes(p[16:])
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_webp(bytes(p[:12]))            # no VP8L chunk


def test_dispatch_and_spark_path(spark):
    """decode_image routes RIFF/WEBP to the native decoder, and the
    q43 fixture's webp rows decode to the exact md5-keystream pixels
    through the Spark feature pass."""
    from drain3_spark import fixtures as FX
    from drain3_spark.pipeline.multimodal import decode_image
    img = FX._md5_pixels(7, 16, 16)
    assert np.array_equal(decode_image(encode_webp_lossless(img)), img)

    items = FX.gen_images_all_formats(spark, 16, width=16, height=16)
    rows = items.filter("fmt = 'webp'").collect()
    assert len(rows) == 2                     # ids 7 and 15
    for r in rows:
        i = int(r.item_id.split("-")[1])
        assert np.array_equal(decode_image(bytes(r.payload)),
                              FX._md5_pixels(i, 16, 16))
