import numpy as np
import pytest

from spider_ray.functions.imagecodec import (
    decode_fake_jpeg,
    decode_image,
    decode_png,
    encode_fake_jpeg,
    encode_png,
    hamming64,
    phash64,
    psnr,
    sniff_format,
)


def _img(seed=0, h=48, w=64):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    img = _img(1)
    data = encode_png(img)
    assert sniff_format(data) == "png"
    out = decode_png(data)
    assert np.array_equal(out, img)
    assert psnr(img, out) == float("inf")


def test_fake_jpeg_psnr_gate():
    img = _img(2, 64, 64)
    data = encode_fake_jpeg(img)
    assert sniff_format(data) == "jpeg"
    out = decode_fake_jpeg(data)
    assert out.shape == img.shape
    p = psnr(img, out)
    assert p >= 40.0, f"lossy codec must clear the 40 dB gate, got {p}"


def test_real_jpeg_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_fake_jpeg(b"\xff\xd8\xff\xe0\x00\x10JFIF" + b"\x00" * 64)


def test_sniffing():
    assert sniff_format(b"%PDF-1.4") == "pdf"
    assert sniff_format(b"garbage") == "bin"


def test_decode_image_dispatch():
    img = _img(3, 32, 32)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert decode_image(encode_fake_jpeg(img)).shape == img.shape


def test_phash_properties():
    img = _img(4, 128, 96)
    h1 = phash64(img)
    assert h1 == phash64(img)  # deterministic
    # small noise → small hamming distance
    noisy = np.clip(img.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    assert hamming64(h1, phash64(noisy)) <= 6
    # unrelated image → larger distance
    other = _img(5, 128, 96)
    assert hamming64(h1, phash64(other)) > 6
    assert -(2**63) <= h1 < 2**63  # fits int64 column


def test_dhash_and_dct_phash_properties():
    import numpy as np

    from spider_ray.functions.imagecodec import (
        dct_phash64,
        dhash64,
        hamming64,
        phash64,
    )
    from spider_ray.sources.fixtures import MockWebConfig, image_pixels

    cfg = MockWebConfig(n_pages=50)
    a = image_pixels(0, cfg)
    b = image_pixels(5, cfg)
    for fn in (dhash64, dct_phash64, phash64):
        # deterministic + self-identical
        assert fn(a) == fn(a)
        # distinct images land far apart
        assert hamming64(fn(a), fn(b)) > 8, fn.__name__

    # dct_phash: EXACTLY invariant to a uniform brightness offset (the
    # constant moves only the DC coefficient, which is dropped)
    shifted = np.clip(a.astype(np.int64) + 10, 0, 255).astype(np.uint8)
    if (a <= 245).all():  # no clipping occurred → exact invariance holds
        assert dct_phash64(shifted) == dct_phash64(a)
    # dhash: gradient signs survive the offset too
    assert hamming64(dhash64(shifted), dhash64(a)) <= 2


def test_dhash_dct_phash_reencode_stability():
    from spider_ray.functions.imagecodec import (
        dct_phash64,
        decode_image,
        dhash64,
        encode_image,
        hamming64,
    )
    from spider_ray.sources.fixtures import MockWebConfig, image_pixels

    cfg = MockWebConfig(n_pages=50)
    for i in range(0, 50, 5):
        px = image_pixels(i, cfg)
        png = decode_image(encode_image(px, "png"))
        jpg = decode_image(encode_image(px, "jpeg"))
        assert hamming64(dhash64(png), dhash64(jpg)) <= 3, i
        assert hamming64(dct_phash64(png), dct_phash64(jpg)) <= 3, i
