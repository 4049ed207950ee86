"""MJPEG/AVI video layer: real container round-trip, real per-frame JPEG
decode, sampling stride, and the poison-payload degrade contract."""

import numpy as np

from audit_star_spark.analytics.multimodal import (
    encode_avi_mjpeg,
    parse_avi,
    video_frame_means,
    video_meta,
)


def _frames(vals, h=8, w=8):
    return [np.full((h, w, 1), v, dtype=np.uint8) for v in vals]


def test_avi_round_trip_header_and_frames():
    payload = encode_avi_mjpeg(_frames([10, 200, 77]), fps=5)
    m = parse_avi(payload)
    assert (m["width"], m["height"], m["n_frames"]) == (8, 8, 3)
    assert m["us_per_frame"] == 200_000
    assert len(m["frames"]) == 3
    from audit_star_spark.analytics.jpeg import decode_jpeg

    for want, frame in zip([10, 200, 77], m["frames"]):
        img = decode_jpeg(frame)
        assert img.shape == (8, 8, 1)
        assert img.mean() == want  # q=100 tile-constant: bit-exact


def test_parse_avi_rejects_non_avi():
    import pytest

    for bad in (b"", b"RIFFxxxxWAVE", b"\x00" * 40):
        with pytest.raises(ValueError):
            parse_avi(bad)


def test_video_operators_sample_and_degrade(spark):
    good = encode_avi_mjpeg(_frames([1, 2, 3, 4, 5]), fps=10)
    media = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"RIFFjunkjunk"))],
        "doc_id long, payload binary",
    )
    meta = {r["doc_id"]: r for r in video_meta(media).collect()}
    assert meta[0]["container"] == "avi" and meta[0]["n_frames"] == 5
    assert meta[0]["fps"] == 10.0
    assert meta[1]["container"] == "unknown" and meta[1]["width"] is None

    rows = video_frame_means(media, every_n=2).collect()
    got = {(r["doc_id"], r["frame_idx"]): r["mean_luma"] for r in rows}
    assert got == {(0, 0): 1.0, (0, 2): 3.0, (0, 4): 5.0}


def test_video_scene_cuts_hand_census(spark):
    from audit_star_spark.analytics.multimodal import video_scene_cuts

    # doc 0: 10 -> 12 -> 240 -> 238 -> 30: cuts at frames 2 and 4
    # doc 1: constant shot (no cuts); doc 2: single frame (no jumps);
    # doc 3: poison payload (no rows at all)
    media = spark.createDataFrame(
        [
            (0, bytearray(encode_avi_mjpeg(_frames([10, 12, 240, 238, 30])))),
            (1, bytearray(encode_avi_mjpeg(_frames([50, 50, 50])))),
            (2, bytearray(encode_avi_mjpeg(_frames([99])))),
            (3, bytearray(b"RIFFjunkjunk")),
        ],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: r
        for r in video_scene_cuts(media, threshold=20.0).collect()
    }
    assert set(got) == {0, 1, 2}  # poison doc contributes no census row
    assert got[0]["n_frames"] == 5 and got[0]["n_cuts"] == 2
    assert got[0]["first_cut_idx"] == 2 and got[0]["max_jump6"] == 228.0
    assert got[1]["n_cuts"] == 0 and got[1]["first_cut_idx"] is None
    assert got[1]["max_jump6"] == 0.0
    assert got[2]["n_frames"] == 1 and got[2]["n_cuts"] == 0
    assert got[2]["max_jump6"] is None  # no inter-frame jump exists


def test_video_scene_cuts_window_is_per_doc(spark):
    from audit_star_spark.analytics.multimodal import video_scene_cuts

    media = spark.createDataFrame(
        [(0, bytearray(encode_avi_mjpeg(_frames([1, 2]))))],
        "doc_id long, payload binary",
    )
    plan = (
        video_scene_cuts(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "partial" in plan.lower()
