"""Library-free baseline JPEG codec (pipeline/jpeg.py)."""

import struct

import numpy as np
import pytest

from drain3_spark.pipeline import multimodal
from drain3_spark.pipeline.jpeg import decode_jpeg, encode_jpeg


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
    # progressive (SOF2) is a declared limit
    img = _gradient(8, 8)
    payload = bytearray(encode_jpeg(img, 90))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    # truncated header -> decode error, not a stub
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0....")


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
