"""Layer III spectral-sample decode via the user-supplied-table escape
hatch (analytics/mp3.py decode_mp3_layer3_samples): round-trip against
the matching encoder under clearly-synthetic tables — scfsi reuse,
linbits escapes, sign bits, zero table, count1 tail, bit-reservoir
main_data_begin, stuffing discard — plus the honest no-tables raise and
table validation errors. No ISO B.7/B.8 constant appears anywhere."""

import pytest

from audit_star_spark.analytics.mp3 import (
    decode_mp3_layer3_samples,
    encode_mp3_layer3_frames,
    encode_mp3_layer3_sideinfo,
    synthetic_l3_tables,
)


def _gran(seed, n_pairs=6, n_quads=3, sc=9, c1=0):
    pairs = [
        (
            (((seed + i) % 3) * (1 if (seed + i) % 2 == 0 else -1)),
            (((seed + 2 * i) % 3) * (1 if (seed + i) % 3 != 1 else -1)),
        )
        for i in range(n_pairs)
    ]
    quads = [
        tuple(
            ((seed + i + j) % 2) * (1 if (i + j) % 2 == 0 else -1)
            for j in range(4)
        )
        for i in range(n_quads)
    ]
    return {
        "global_gain": (seed * 7) % 256,
        "scalefac_compress": sc,
        "window_switching": 0, "block_type": 0, "mixed_block": 0,
        "table_select": [1, 1, 1],
        "region0_count": 4, "region1_count": 5,
        "preflag": 0, "scalefac_scale": 0, "count1table_select": c1,
        "scalefacs": [(seed + j) % 4 for j in range(21)],
        "pairs": pairs, "quads": quads,
    }


def _expected_samples(g):
    out = []
    for x, y in g["pairs"]:
        out.extend((x, y))
    for q in g["quads"]:
        out.extend(q)
    return out + [0] * (576 - len(out))


def test_no_tables_raises_naming_the_spec():
    with pytest.raises(NotImplementedError, match="B.7"):
        decode_mp3_layer3_samples(b"\x00")


def test_roundtrip_two_frames_with_scfsi_reuse():
    tables = synthetic_l3_tables(max_val=2)
    frames = [
        {"scfsi": [0b1010], "granules": [[_gran(5)], [_gran(9)]]},
        {"scfsi": [0b0000], "granules": [[_gran(2)], [_gran(3)]]},
    ]
    r = decode_mp3_layer3_samples(
        encode_mp3_layer3_frames(frames, tables), tables
    )
    assert r["n_frames"] == 2 and len(r["granules"]) == 4
    for gi, (fi, gr) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        spec = frames[fi]["granules"][gr][0]
        got = r["granules"][gi]
        assert got["samples"] == _expected_samples(spec)
        assert got["stuffing_bits"] == 0
        exp_sf = list(spec["scalefacs"])
        if gr == 1:
            scfsi = frames[fi]["scfsi"][0]
            g0 = frames[fi]["granules"][0][0]["scalefacs"]
            for b, (lo, hi) in enumerate(((0, 6), (6, 11), (11, 16), (16, 21))):
                if (scfsi >> (3 - b)) & 1:
                    exp_sf[lo:hi] = g0[lo:hi]
        assert got["scalefacs"] == exp_sf


def test_linbits_escape_values():
    tables = synthetic_l3_tables(max_val=2, linbits=3)
    g = _gran(4)
    g["pairs"] = [(7, -3), (1, 0), (-2, 2)]  # 7 = esc 2 + linbits 5
    r = decode_mp3_layer3_samples(
        encode_mp3_layer3_frames(
            [{"scfsi": [0], "granules": [[g], [_gran(1)]]}], tables
        ),
        tables,
    )
    assert r["granules"][0]["samples"][:6] == [7, -3, 1, 0, -2, 2]


def test_value_beyond_table_range_rejected_at_encode():
    tables = synthetic_l3_tables(max_val=2)  # no linbits
    g = _gran(4)
    g["pairs"] = [(5, 0)]
    with pytest.raises(ValueError, match="no linbits"):
        encode_mp3_layer3_frames(
            [{"scfsi": [0], "granules": [[g], [_gran(1)]]}], tables
        )


def test_zero_table_region():
    """table_select 0 is the zero table: (0, 0) pairs at zero bits."""
    tables = synthetic_l3_tables(max_val=2)
    g = _gran(4, n_pairs=0, n_quads=2)
    g["table_select"] = [0, 0, 0]
    g["pairs"] = [(0, 0)] * 4
    r = decode_mp3_layer3_samples(
        encode_mp3_layer3_frames(
            [{"scfsi": [0], "granules": [[g], [_gran(1)]]}], tables
        ),
        tables,
    )
    got = r["granules"][0]["samples"]
    assert got[:8] == [0] * 8
    exp_quads = [v for q in g["quads"] for v in q]
    assert got[8 : 8 + len(exp_quads)] == exp_quads


def test_sideinfo_only_frames_decode_as_silence():
    """Zero-filled main data (the side-info encoder's output) under a
    zero-table granule spec decodes to all-zero spectra — the two
    encoders agree on the frame layout."""
    tables = synthetic_l3_tables(max_val=2)
    frames = [
        {
            "main_data_begin": 0,
            "scfsi": [0],
            "granules": [
                [
                    {
                        "part2_3_length": 0, "big_values": 0,
                        "global_gain": 0, "scalefac_compress": 0,
                        "window_switching": 0, "block_type": 0,
                        "mixed_block": 0, "table_select": [0, 0, 0],
                        "region0_count": 0, "region1_count": 0,
                        "preflag": 0, "scalefac_scale": 0,
                        "count1table_select": 0,
                    }
                ]
                for _ in range(2)
            ],
        }
    ]
    payload = encode_mp3_layer3_sideinfo(frames, kbps=64)
    r = decode_mp3_layer3_samples(payload, tables)
    assert all(
        all(v == 0 for v in g["samples"]) for g in r["granules"]
    )


def test_table_validation_errors():
    with pytest.raises(ValueError, match="huffman"):
        decode_mp3_layer3_samples(b"\x00", {"count1": {}})
    bad = synthetic_l3_tables()
    bad["sfb_long"] = [0, 10, 5, 576]
    with pytest.raises(ValueError, match="strictly increasing"):
        decode_mp3_layer3_samples(b"\x00", bad)
    dup = synthetic_l3_tables()
    dup["huffman"][1]["codes"] = {(0, 0): "0", (0, 1): "01"}
    with pytest.raises(ValueError, match="prefix"):
        decode_mp3_layer3_samples(b"\x00", dup)


def test_census_operator(spark):
    """End-to-end through mapInPandas: decoded sums match the per-doc
    closed forms; a poison payload degrades to NULLs."""
    import pandas as pd

    from audit_star_spark.analytics.multimodal import (
        mp3_layer3_samples_census,
    )

    tables = synthetic_l3_tables(max_val=2)
    g = _gran(3)
    payload = encode_mp3_layer3_frames(
        [{"scfsi": [0], "granules": [[g], [_gran(6)]]}], tables
    )
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "payload": pd.Series([payload, b"junk"], dtype="object"),
            }
        )
    )
    rows = {
        r["doc_id"]: r
        for r in mp3_layer3_samples_census(media, tables).collect()
    }
    exp = _expected_samples(g) + _expected_samples(_gran(6))
    assert rows[1]["sum_samples"] == sum(exp)
    assert rows[1]["sum_abs_samples"] == sum(abs(v) for v in exp)
    assert rows[1]["n_nonzero"] == sum(1 for v in exp if v)
    assert rows[2]["n_frames"] is None  # poison degrade
