"""Pure-stdlib PNG/BMP codec + real decode inside the multimodal feature
pipeline (upgrades the round-1 decode stub)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fornax_spark.operators.imagecodec import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type):
    rng = np.random.default_rng(3 + filter_type)
    for shape in [(16, 32, 3), (7, 5, 3), (9, 13, 4), (6, 8, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(img, filter_type=filter_type)), img
        ), (shape, filter_type)


def test_bmp_decode():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    w, h = 6, 5
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up, BGR, 4-byte padded
        rows += img[y][:, ::-1].tobytes() + b"\x00" * (stride - w * 3)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
        )
    )
    assert np.array_equal(decode_bmp(header + rows), img)


def test_decode_image_sniffs_and_validates():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    png = encode_png(img)
    assert np.array_equal(decode_image(png), img)
    assert np.array_equal(decode_image(png, width=6, height=4), img)
    with pytest.raises(ValueError, match="metadata width"):
        decode_image(png, width=7)
    with pytest.raises(ValueError, match="unknown image format"):
        decode_image(b"\xff\xd8\xff junk")
    with pytest.raises(NotImplementedError):
        decode_image(None)


def test_image_features_real_png_decode(spark):
    """The default feature pipeline decodes REAL PNG payloads; features
    equal a numpy mean-pool oracle over the decoded pixels."""
    from fornax_spark.operators.imagecodec import decode_png as dec
    from fornax_spark.operators.multimodal import (
        image_features,
        synthetic_assets,
    )

    assets = synthetic_assets(spark, n=12)
    got = {
        r["asset_id"]: np.array(r["feature"], dtype=np.float32)
        for r in image_features(assets, resize_to=(4, 4)).collect()
    }
    payloads = {
        r["asset_id"]: bytes(r["payload"])
        for r in assets.collect()
        if r["kind"] == "image"
    }
    assert set(got) == set(payloads)
    for aid, png in payloads.items():
        img = dec(png)
        want = (
            img[:16, :32]
            .reshape(4, 4, 4, 8, 3)
            .mean(axis=(1, 3))
            .astype(np.float32)
            .ravel()
        )
        assert np.allclose(got[aid], want), aid
