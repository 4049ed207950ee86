"""Property-based locks (hypothesis) for the round-8 codec layer: FLAC
round-trips under random shapes, HTTP envelope round-trips under random
bodies/encodings, GIF animation compositing vs an independent reference
compositor under random patch stacks. Pure-Python codecs — no Spark
session needed, so hypothesis can run many examples cheaply."""

import numpy as np
from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 1200),
    bps=st.sampled_from([8, 12, 16, 24]),
    channels=st.integers(1, 3),
    block=st.sampled_from([64, 192, 256]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_random(n, bps, channels, block, seed):
    from audit_star_spark.analytics.flac import encode_flac, parse_flac

    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    # mix constant stretches (CONSTANT path), ramps (FIXED path) and
    # noise (VERBATIM path)
    kind = seed % 3
    if kind == 0:
        s = np.full((n, channels), rng.integers(lo, hi), dtype=np.int64)
    elif kind == 1:
        base = rng.integers(lo // 2, hi // 2)
        step = int(rng.integers(-3, 4))
        col = np.clip(base + step * np.arange(n), lo, hi)
        s = np.stack([col] * channels, axis=1)
    else:
        s = rng.integers(lo, hi + 1, size=(n, channels))
    rate = int(rng.integers(1, 1 << 20))
    payload = encode_flac(s, rate, bps=bps, block_size=block)
    got_rate, got_ch, got_bps, got = parse_flac(payload)
    assert (got_rate, got_ch, got_bps) == (rate, channels, bps)
    assert np.array_equal(got, s)


@settings(max_examples=60, deadline=None)
@given(
    body=st.binary(min_size=0, max_size=400),
    status=st.sampled_from([200, 204, 301, 404, 500]),
    gz=st.booleans(),
    chunked=st.booleans(),
    ctype=st.sampled_from(
        ["text/html; charset=utf-8", "application/json", "text/plain;charset=ISO-8859-1"]
    ),
)
def test_http_envelope_roundtrip_random(body, status, gz, chunked, ctype):
    from audit_star_spark.sources.warc import (
        encode_http_response,
        parse_http_response,
    )

    env = parse_http_response(
        encode_http_response(
            status, body, content_type=ctype, gzip_body=gz, chunked=chunked
        )
    )
    assert env["status"] == status
    assert env["body"] == body
    assert env["mime"] == ctype.split(";")[0].strip().lower()
    if "charset" in ctype:
        assert env["charset"] == ctype.split("charset=")[1].strip().lower()


@settings(max_examples=30, deadline=None)
@given(
    n_patches=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_animation_matches_reference_compositor(n_patches, seed):
    from audit_star_spark.analytics.gif import (
        encode_gif_animation,
        parse_gif_frames,
    )
    from tests.test_gif import _ref_composite

    rng = np.random.default_rng(seed)
    sw, sh = int(rng.integers(4, 12)), int(rng.integers(4, 12))
    patches = []
    for _ in range(n_patches):
        w = int(rng.integers(1, sw + 1))
        h = int(rng.integers(1, sh + 1))
        left = int(rng.integers(0, sw - w + 1))
        top = int(rng.integers(0, sh - h + 1))
        img = rng.integers(0, 12, size=(h, w, 3)).astype(np.uint8) * 20
        p = {
            "img": img,
            "left": left,
            "top": top,
            "disposal": int(rng.integers(0, 4)),
        }
        if rng.random() < 0.5:
            p["mask"] = rng.random((h, w)) < 0.7
        patches.append(p)
    bg = (7, 11, 13)
    frames = parse_gif_frames(
        encode_gif_animation(patches, (sw, sh), bg_rgb=bg)
    )
    want = _ref_composite(patches, (sw, sh), bg_rgb=bg)
    assert len(frames) == len(want)
    for got, exp in zip(frames, want):
        assert np.array_equal(got["frame"], exp)
