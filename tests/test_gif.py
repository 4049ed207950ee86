"""GIF codec (analytics/gif.py): LZW roundtrips incl. width growth and
12-bit reset, interlace, palettes, multi-frame, poison degradation, and
the image_meta surface."""

import numpy as np
import pytest

from audit_star_spark.analytics.gif import (
    decode_gif,
    encode_gif,
    parse_gif,
)

RNG = np.random.default_rng(17)


def test_grayscale_roundtrip_exact():
    img = RNG.integers(0, 256, (13, 21, 1), dtype=np.uint8)
    out = decode_gif(encode_gif(img))
    assert out.shape == (13, 21, 3)
    for ch in range(3):  # identity palette: every channel equals the gray
        assert np.array_equal(out[:, :, ch], img[:, :, 0])


def test_rgb_palette_roundtrip_exact():
    colors = RNG.integers(0, 256, (40, 3), dtype=np.uint8)
    img = colors[RNG.integers(0, 40, (9, 7))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    with pytest.raises(ValueError, match="256 distinct"):
        big = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        encode_gif(big)  # ~1000 distinct colors


def test_interlace_roundtrip_exact():
    img = RNG.integers(0, 256, (17, 5, 1), dtype=np.uint8)
    out = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(out[:, :, 0], img[:, :, 0])


def test_lzw_12bit_growth_and_reset():
    """> 4096 pixels forces the code width to 12 bits and through the
    encoder's clear-and-reset path; decode must stay exact."""
    img = RNG.integers(0, 256, (80, 70, 1), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img))[:, :, 0], img[:, :, 0])


def test_multi_frame_first_returned_and_counted():
    img = RNG.integers(0, 256, (6, 6, 1), dtype=np.uint8)
    frame, n = parse_gif(encode_gif(img, n_frames=3))
    assert n == 3
    assert np.array_equal(frame[:, :, 0], img[:, :, 0])


def test_extension_blocks_are_skipped():
    """Insert a graphics-control extension before the image descriptor —
    the 89a structure real encoders emit."""
    img = RNG.integers(0, 256, (4, 4, 1), dtype=np.uint8)
    data = bytearray(encode_gif(img))
    desc = 6 + 7 + 768  # header + LSD + 256-entry global table
    assert data[desc] == 0x2C
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, 4-byte block, term
    patched = bytes(data[:desc]) + ext + bytes(data[desc:])
    assert np.array_equal(decode_gif(patched)[:, :, 0], img[:, :, 0])


def test_poison_payloads_raise_for_decoder_degrade(spark):
    from audit_star_spark.analytics.multimodal import image_meta

    img = RNG.integers(0, 256, (5, 5, 1), dtype=np.uint8)
    good = encode_gif(img)
    for bad in (b"GIF89a" + b"\x00" * 5, good[:30], good[:-10]):
        with pytest.raises((ValueError, IndexError)):
            decode_gif(bad)
    # and through Spark: degrade, never raise
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:25]))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_meta(media).collect()}
    assert rows[1]["format"] == "gif" and rows[1]["width"] == 5
    assert rows[2]["format"] == "unknown" and rows[2]["width"] is None


# ------------------------------------------------- animation compositing


def _ref_composite(patches, screen, bg_rgb=(0, 0, 0)):
    """Independent numpy reference compositor: the GIF89a disposal rules
    restated from the spec, no shared code with gif.py's walker."""
    import numpy as np

    sw, sh = screen
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = np.array(bg_rgb, dtype=np.uint8)
    out = []
    for p in patches:
        img, mask = p["img"], p.get("mask")
        left, top = p.get("left", 0), p.get("top", 0)
        h, w = img.shape[:2]
        saved = canvas.copy()
        rect = canvas[top : top + h, left : left + w]
        if mask is None:
            rect[:, :] = img
        else:
            rect[mask] = img[mask]
        out.append(canvas.copy())
        d = p.get("disposal", 0)
        if d == 2:
            canvas[top : top + h, left : left + w] = np.array(
                bg_rgb, dtype=np.uint8
            )
        elif d == 3:
            canvas = saved
    return out


def test_animation_disposal_none_overlays():
    """Disposal 0/1: later frames paint over the accumulated canvas."""
    import numpy as np

    from audit_star_spark.analytics.gif import (
        encode_gif_animation,
        parse_gif_frames,
    )

    base = np.full((6, 8, 3), 40, dtype=np.uint8)
    patch = np.full((2, 3, 3), 200, dtype=np.uint8)
    patches = [
        {"img": base, "disposal": 0},
        {"img": patch, "left": 2, "top": 1, "disposal": 1},
    ]
    frames = parse_gif_frames(encode_gif_animation(patches, (8, 6)))
    want = _ref_composite(patches, (8, 6))
    assert len(frames) == 2
    for got, exp in zip(frames, want):
        assert np.array_equal(got["frame"], exp)
    # frame 2 kept the base outside the patch rect
    assert (frames[1]["frame"][0, 0] == 40).all()
    assert (frames[1]["frame"][1, 2] == 200).all()


def test_animation_disposal_background_restores_rect():
    """Disposal 2: the frame's RECT reverts to the background color
    before the next frame composites."""
    import numpy as np

    from audit_star_spark.analytics.gif import (
        encode_gif_animation,
        parse_gif_frames,
    )

    bg = (10, 20, 30)
    a = np.full((3, 3, 3), 100, dtype=np.uint8)
    b = np.full((2, 2, 3), 250, dtype=np.uint8)
    patches = [
        {"img": a, "left": 1, "top": 1, "disposal": 2},
        {"img": b, "left": 5, "top": 0, "disposal": 0},
    ]
    frames = parse_gif_frames(encode_gif_animation(patches, (8, 5), bg_rgb=bg))
    want = _ref_composite(patches, (8, 5), bg_rgb=bg)
    for got, exp in zip(frames, want):
        assert np.array_equal(got["frame"], exp)
    # in frame 2, frame 1's rect is background again
    assert tuple(frames[1]["frame"][2, 2]) == bg
    assert tuple(frames[1]["frame"][0, 5]) == (250, 250, 250)


def test_animation_disposal_previous_restores_canvas():
    """Disposal 3: canvas reverts to its pre-frame state, so frame 3
    composites over frame 1's pixels, not frame 2's."""
    import numpy as np

    from audit_star_spark.analytics.gif import (
        encode_gif_animation,
        parse_gif_frames,
    )

    base = np.full((4, 4, 3), 60, dtype=np.uint8)
    flash = np.full((4, 4, 3), 255, dtype=np.uint8)
    dot = np.full((1, 1, 3), 0, dtype=np.uint8)
    patches = [
        {"img": base, "disposal": 0},
        {"img": flash, "disposal": 3},  # restored after display
        {"img": dot, "left": 2, "top": 2, "disposal": 0},
    ]
    frames = parse_gif_frames(encode_gif_animation(patches, (4, 4)))
    want = _ref_composite(patches, (4, 4))
    for got, exp in zip(frames, want):
        assert np.array_equal(got["frame"], exp)
    # frame 3: flash gone, base back, dot on top
    assert (frames[2]["frame"][0, 0] == 60).all()
    assert (frames[2]["frame"][2, 2] == 0).all()


def test_animation_transparency_lets_canvas_show_through():
    import numpy as np

    from audit_star_spark.analytics.gif import (
        encode_gif_animation,
        parse_gif_frames,
    )

    base = np.full((3, 3, 3), 80, dtype=np.uint8)
    over = np.full((3, 3, 3), 160, dtype=np.uint8)
    mask = np.zeros((3, 3), dtype=bool)
    mask[1, 1] = True  # only the center is opaque
    patches = [
        {"img": base, "disposal": 0},
        {"img": over, "mask": mask, "disposal": 0},
    ]
    frames = parse_gif_frames(encode_gif_animation(patches, (3, 3)))
    want = _ref_composite(patches, (3, 3))
    for got, exp in zip(frames, want):
        assert np.array_equal(got["frame"], exp)
    assert frames[1]["transparent"]
    assert (frames[1]["frame"][0, 0] == 80).all()
    assert (frames[1]["frame"][1, 1] == 160).all()


def test_animation_metadata_and_single_frame_matches_decode():
    import numpy as np

    from audit_star_spark.analytics.gif import (
        decode_gif,
        encode_gif,
        encode_gif_animation,
        parse_gif_frames,
    )

    img = (np.arange(48, dtype=np.uint8).reshape(4, 4, 3) * 5) % 200
    payload = encode_gif_animation(
        [{"img": img, "disposal": 2, "delay_cs": 7}], (4, 4)
    )
    frames = parse_gif_frames(payload)
    assert len(frames) == 1
    f = frames[0]
    assert (f["width"], f["height"], f["disposal"], f["delay_cs"]) == (4, 4, 2, 7)
    assert np.array_equal(f["frame"], img)
    # non-animated encode_gif output: parse_gif_frames == decode_gif
    plain = encode_gif(img)
    assert np.array_equal(parse_gif_frames(plain)[0]["frame"], decode_gif(plain))


def test_gif_frame_means_spark_surface(spark):
    """The Spark operator: per-frame channel means equal the closed-form
    composite means, frame count and disposal metadata surface."""
    import numpy as np
    from pyspark.sql import functions as F

    from audit_star_spark.analytics.gif import encode_gif_animation
    from audit_star_spark.analytics.multimodal import gif_frame_means

    rows = []
    expected = {}
    for doc_id in range(6):
        v = 20 * (doc_id + 1)
        base = np.full((4, 6, 3), v, dtype=np.uint8)
        patch = np.full((2, 2, 3), 240, dtype=np.uint8)
        patches = [
            {"img": base, "disposal": 0},
            {"img": patch, "left": 1, "top": 1, "disposal": 2},
            {"img": patch, "left": 3, "top": 0, "disposal": 0},
        ]
        rows.append((doc_id, encode_gif_animation(patches, (6, 4))))
        comp = _ref_composite(patches, (6, 4))
        for i, fr in enumerate(comp):
            expected[(doc_id, i)] = tuple(
                round(float(fr[:, :, c].mean()), 6) for c in range(3)
            )
    rows.append((99, b"GIF89a<poison>"))  # degrades to zero rows
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["doc_id"], r["frame_idx"]): (r["mean_r"], r["mean_g"], r["mean_b"])
        for r in gif_frame_means(df).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == expected[k]
    # narrow plan: no shuffle
    plan = gif_frame_means(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_parse_gif_frames_truncation_always_valueerror():
    """ADVICE r8: parse_gif_frames documents ValueError on truncated
    streams — truncation points that used to surface as IndexError
    (mid image descriptor, mid color table, mid min-code byte) must be
    re-raised as ValueError."""
    from audit_star_spark.analytics.gif import (
        encode_gif_animation,
        parse_gif_frames,
    )

    img = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_gif_animation([{"img": img}], (4, 4))
    frames = parse_gif_frames(good)
    assert len(frames) == 1
    # every truncation point from just-past-header to just-before-end
    for cut in range(14, len(good) - 1):
        try:
            parse_gif_frames(good[:cut])
        except ValueError:
            pass  # the documented contract — never IndexError
