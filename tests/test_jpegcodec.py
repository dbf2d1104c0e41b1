"""Real baseline T.81 JPEG codec — round-trip, sampling, restart, dispatch."""

import numpy as np
import pytest

from spider_ray.functions.imagecodec import decode_image, psnr, sniff_format
from spider_ray.functions.jpegcodec import decode_jpeg, encode_jpeg


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 // max(1, h - 1),
            xx * 255 // max(1, w - 1),
            (yy + xx) * 255 // max(1, h + w - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_roundtrip_444_psnr_gate():
    px = _smooth(64, 48)
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert out.shape == px.shape
    assert psnr(px, out) >= 40.0  # the north-rule lossy-format gate


def test_roundtrip_420_subsampled():
    px = _smooth(64, 48)
    data = encode_jpeg(px, quality=95, subsample=True)
    out = decode_jpeg(data)
    assert out.shape == px.shape
    assert psnr(px, out) >= 40.0
    # 4:2:0 must be smaller than 4:4:4 on the same content
    assert len(data) < len(encode_jpeg(px, quality=95))


def test_solid_color_exact():
    solid = np.full((16, 16, 3), 120, np.uint8)
    out = decode_jpeg(encode_jpeg(solid, quality=90))
    assert int(np.abs(out.astype(int) - 120).max()) == 0


def test_quality_100_near_lossless_on_noise():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert psnr(px, out) >= 45.0


def test_odd_dimensions_and_grayscale():
    px = _smooth(17, 23)
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert out.shape == (17, 23, 3)
    assert psnr(px, out) >= 38.0

    g = _smooth(33, 19)[..., 0]
    og = decode_jpeg(encode_jpeg(g, quality=95))
    assert og.shape == (33, 19)
    assert psnr(g, og) >= 40.0


def test_restart_intervals_match_plain_encoding():
    px = _smooth(64, 64)
    plain = decode_jpeg(encode_jpeg(px, quality=90))
    with_rst = decode_jpeg(encode_jpeg(px, quality=90, restart_interval=3))
    assert np.array_equal(plain, with_rst)  # RSTn must not change pixels


def test_restart_intervals_with_subsampling():
    px = _smooth(48, 40)
    plain = decode_jpeg(encode_jpeg(px, quality=85, subsample=True))
    with_rst = decode_jpeg(encode_jpeg(px, quality=85, subsample=True, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_decode_image_dispatches_real_jpeg():
    px = _smooth(32, 32)
    data = encode_jpeg(px, quality=95)
    assert sniff_format(data) == "jpeg"
    out = decode_image(data)  # no FAKEJPG tag -> real T.81 path
    assert psnr(px, out) >= 40.0


def test_progressive_rejected():
    data = bytearray(encode_jpeg(_smooth(16, 16)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_fuzz_roundtrip_bounded_error():
    rng = np.random.default_rng(11)
    for _ in range(4):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        # low-frequency content: smooth base + mild noise
        base = _smooth(h, w).astype(np.int16)
        px = np.clip(base + rng.integers(-8, 9, size=base.shape), 0, 255).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=95))
        assert out.shape == px.shape
        assert psnr(px, out) >= 30.0
