"""Library-free baseline JPEG codec (pipeline/jpeg.py)."""

import struct

import numpy as np
import pytest

from drain3_spark.pipeline import multimodal
from drain3_spark.pipeline.jpeg import (decode_jpeg, encode_jpeg,
                                        encode_jpeg_progressive)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient(h, w):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([(x * 8) % 256, (y * 10) % 256, ((x + y) * 5) % 256],
                    axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_quality_ladder():
    img = _gradient(29, 37)
    prev = 0.0
    for q, floor in ((70, 33), (90, 38), (95, 42)):
        got = decode_jpeg(encode_jpeg(img, q))
        assert got.shape == img.shape
        p = _psnr(img, got)
        assert p >= floor, (q, p)
        assert p >= prev            # higher quality never reconstructs worse
        prev = p


def test_jpeg_grayscale_and_flat():
    x, y = np.meshgrid(np.arange(32), np.arange(24))
    g = ((x * 3 + y * 5) % 256).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(g, 90))
    assert got.shape == (24, 32, 1)            # gray stays 1-channel
    assert _psnr(g[..., None], got) >= 45

    flat = np.full((8, 8, 3), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)


def test_jpeg_subsampling_and_restart_markers():
    img = _gradient(29, 37)
    base = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
    assert base.shape == img.shape
    assert _psnr(img, base) >= 25              # chroma is box+nearest
    # 4:2:2 loses only horizontal chroma: strictly between 444 and 420
    p444 = _psnr(img, decode_jpeg(encode_jpeg(img, 90)))
    p422 = _psnr(img, decode_jpeg(encode_jpeg(img, 90, subsampling="422")))
    assert _psnr(img, base) < p422 < p444
    odd422 = img[:21, :13]
    got = decode_jpeg(encode_jpeg(odd422, 85, subsampling="422",
                                  restart_interval=3))
    assert got.shape == odd422.shape and _psnr(odd422, got) >= 30

    # restart markers: byte-exact with the unrestarted stream's pixels
    rst = decode_jpeg(encode_jpeg(img, 90, subsampling="420",
                                  restart_interval=2))
    assert np.array_equal(rst, base)
    rst444 = decode_jpeg(encode_jpeg(img, 90, restart_interval=3))
    assert np.array_equal(rst444, decode_jpeg(encode_jpeg(img, 90)))

    # odd (non-multiple-of-16) dims survive the 16x16 MCU padding
    odd = img[:23, :19]
    got = decode_jpeg(encode_jpeg(odd, 85, subsampling="420"))
    assert got.shape == odd.shape


def test_jpeg_noise_roundtrip():
    rng = np.random.RandomState(3)
    n = rng.randint(0, 256, (17, 19, 3), np.uint8)
    assert _psnr(n, decode_jpeg(encode_jpeg(n, 95))) >= 30


def test_jpeg_declared_limits_and_errors():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # lossless (SOF3) is a declared limit
    img = _gradient(8, 8)
    payload = bytearray(encode_jpeg(img, 90))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    # truncated header -> decode error, not a stub
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0....")


# ------------------------------------------------------ progressive (SOF2)

def test_progressive_matches_baseline():
    """The progressive encoder's fully refined coefficients equal the
    baseline encoder's, so decode must be PIXEL-IDENTICAL for the two
    streams — gray + color, every subsampling, odd sizes, a quality
    ladder."""
    img = _gradient(61, 45)
    gray = img[..., 0]
    for src, sub, q in [
        (img, "444", 90), (img, "422", 75), (img, "420", 50),
        (img[:23, :19], "420", 90), (gray, "444", 85), (gray[:9, :9], "444", 95),
    ]:
        b = decode_jpeg(encode_jpeg(src, q, subsampling=sub))
        p = decode_jpeg(encode_jpeg_progressive(src, q, subsampling=sub))
        assert np.array_equal(b, p), (sub, q, src.shape)


def test_progressive_stream_is_sof2_multiscan():
    data = encode_jpeg_progressive(_gradient(32, 32), 90)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # 1 DC first + 3 comps x 2 bands x (first + refine) + 1 DC refine
    assert data.count(b"\xff\xda") == 14
    gray = encode_jpeg_progressive(_gradient(32, 32)[..., 0], 90)
    assert gray.count(b"\xff\xda") == 6


def test_progressive_restart_markers():
    """RSTn inside progressive scans: DC predictors and EOB runs reset;
    pixels stay byte-exact with the unrestarted stream."""
    img = _gradient(64, 48)
    plain = decode_jpeg(encode_jpeg_progressive(img, 90, subsampling="420"))
    rst = encode_jpeg_progressive(img, 90, subsampling="420",
                                  restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    assert np.array_equal(decode_jpeg(rst), plain)


def test_progressive_exercises_eob_runs():
    """A smooth image's high-frequency band is all zeros, so the AC
    first scans must fold whole block rows into EOB runs with r > 0 —
    the stream has to be much smaller than one EOB symbol per block
    per scan would allow, and still decode exactly."""
    flat = np.full((64, 64, 3), 180, np.uint8)
    data = encode_jpeg_progressive(flat, 90)
    assert np.array_equal(decode_jpeg(data), flat)
    noisy = encode_jpeg_progressive(
        np.random.RandomState(0).randint(0, 256, (64, 64, 3)).astype(np.uint8),
        90)
    assert len(data) < len(noisy) / 4


def test_progressive_through_spark_image_ops(spark):
    """SOF2 payloads flow through decode_image dispatch untouched —
    same mapInPandas plumbing as baseline JPEG."""
    img = _gradient(16, 16)
    rows = [("prog-0", bytearray(encode_jpeg_progressive(img, 92))),
            ("base-0", bytearray(encode_jpeg(img, 92)))]
    items = spark.createDataFrame(rows, "item_id string, payload binary")
    feats = {r.item_id: r for r in multimodal.image_features(items).collect()}
    assert feats["prog-0"].width == 16 and feats["prog-0"].channels == 3
    # identical coefficients -> identical luma histogram for both streams
    assert feats["prog-0"].histogram == feats["base-0"].histogram


def test_jpeg_through_spark_image_ops(spark):
    """JPEG payloads flow through the same mapInPandas feature/resize
    plumbing as every other container, via decode_image dispatch."""
    rows = []
    for i in range(4):
        img = _gradient(16, 16)
        rows.append((f"jpg-{i}", bytearray(encode_jpeg(img, 92))))
    items = spark.createDataFrame(rows, "item_id string, payload binary")
    feats = {r.item_id: r for r in multimodal.image_features(items).collect()}
    assert len(feats) == 4
    assert all(r.width == 16 and r.height == 16 and r.channels == 3
               for r in feats.values())
    resized = multimodal.resize_images(items, out_w=4, out_h=4).collect()
    assert all(len(r.pixels) == 4 * 4 * 3 for r in resized)
