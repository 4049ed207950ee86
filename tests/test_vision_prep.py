"""Vision preprocessing (multimodal.py): bilinear resize differential
against an independent scalar reference, linear-image exactness, crop /
flip invariants, and the Spark chain."""

import numpy as np
import pytest

from audit_star_spark.analytics.multimodal import (
    center_crop,
    decode_image,
    encode_netpbm,
    hflip,
    resize_bilinear,
    vision_preprocess,
)


def _ref_bilinear(img, width, height):
    """Independent per-pixel restatement of the half-pixel-center
    convention — no shared code with the vectorized gather."""
    h, w, c = img.shape
    out = np.zeros((height, width, c), dtype=np.float64)
    for yd in range(height):
        sy = min(max((yd + 0.5) * h / height - 0.5, 0), h - 1)
        y0, fy = int(sy), sy - int(sy)
        y1 = min(y0 + 1, h - 1)
        for xd in range(width):
            sx = min(max((xd + 0.5) * w / width - 0.5, 0), w - 1)
            x0, fx = int(sx), sx - int(sx)
            x1 = min(x0 + 1, w - 1)
            for ch in range(c):
                a = img[y0, x0, ch] * (1 - fx) + img[y0, x1, ch] * fx
                b = img[y1, x0, ch] * (1 - fx) + img[y1, x1, ch] * fx
                out[yd, xd, ch] = a * (1 - fy) + b * fy
    return np.clip(np.floor(out + 0.5), 0, 255).astype(img.dtype)


def test_bilinear_matches_scalar_reference_up_and_down():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    for tw, th in [(14, 22), (5, 4), (7, 11), (1, 1)]:
        got = resize_bilinear(img, tw, th)
        assert np.array_equal(got, _ref_bilinear(img, tw, th)), (tw, th)


def test_bilinear_exact_on_constant_and_preserves_linear():
    const = np.full((9, 13, 1), 77, dtype=np.uint8)
    assert (resize_bilinear(const, 30, 5) == 77).all()
    # a per-axis-linear image: interior samples reproduce the plane
    y, x = np.mgrid[0:16, 0:16]
    img = (10 + 5 * x + 3 * y).astype(np.uint8)[:, :, None]
    out = resize_bilinear(img, 32, 32)
    # interior output pixel (xd, yd) samples sx=(xd+.5)/2-.5 exactly
    for yd, xd in [(10, 10), (15, 21), (8, 30)]:
        sx = (xd + 0.5) / 2 - 0.5
        sy = (yd + 0.5) / 2 - 0.5
        want = int(np.floor(10 + 5 * sx + 3 * sy + 0.5))
        assert out[yd, xd, 0] == want


def test_bilinear_uint16_dtype_and_validation():
    img = np.full((4, 4, 1), 4000, dtype=np.uint16)
    out = resize_bilinear(img, 8, 8)
    assert out.dtype == np.uint16 and (out == 4000).all()
    with pytest.raises(ValueError, match="dimensions"):
        resize_bilinear(img, 0, 4)


def test_crop_and_flip_invariants():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    assert np.array_equal(hflip(hflip(img)), img)
    c = center_crop(img, 6, 4)
    assert c.shape == (4, 6, 3)
    assert np.array_equal(c, img[3:7, 3:9])
    with pytest.raises(ValueError, match="exceeds"):
        center_crop(img, 20, 4)


def test_vision_preprocess_spark_chain(spark):
    """decode -> flip -> resize -> crop through the Spark surface equals
    the same numpy chain per image; poison degrades; plan is narrow."""
    rng = np.random.default_rng(29)
    rows, want = [], {}
    for doc_id in range(8):
        img = rng.integers(0, 256, size=(9 + doc_id, 11, 3), dtype=np.uint8)
        rows.append((doc_id, encode_netpbm(img)))
        ref = center_crop(resize_bilinear(hflip(img), 16, 12), 8, 8)
        want[doc_id] = (
            np.ascontiguousarray(ref),
            round(float(ref.astype(np.float64).mean()), 6),
        )
    rows.append((99, b"P6 poison"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = vision_preprocess(df, 16, 12, crop=(8, 8), flip=True)
    got = {r["doc_id"]: r for r in out.collect()}
    for d in range(8):
        r = got[d]
        assert (r["width"], r["height"]) == (8, 8)
        assert r["mean_luma"] == want[d][1]
        assert np.array_equal(decode_image(bytes(r["payload"])), want[d][0])
    assert got[99]["payload"] is None and got[99]["mean_luma"] is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
