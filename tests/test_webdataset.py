"""WebDataset source (sources/webdataset.py): grouping conventions,
interleaved members, truncation/poison degradation, the Spark sample
surface, and composition with the multimodal decoders."""

from audit_star_spark.sources.webdataset import (
    encode_webdataset,
    parse_webdataset,
    webdataset_samples,
)

SAMPLES = [
    {"key": "000001", "components": {"txt": b"hello", "cls": b"3"}},
    {"key": "000002", "components": {"txt": b"world", "json": b"{}"}},
]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        out = parse_webdataset(encode_webdataset(SAMPLES, gz=gz))
        assert [s["key"] for s in out] == ["000001", "000002"]
        assert out[0]["components"] == {"txt": b"hello", "cls": b"3"}
        assert out[1]["components"] == {"txt": b"world", "json": b"{}"}


def test_key_split_convention():
    """Key = basename up to the FIRST dot; multi-dot extensions stay
    whole components; directory prefixes belong to the key."""
    samples = [
        {
            "key": "shard0/a",
            "components": {"seg.png": b"p", "txt": b"t"},
        }
    ]
    out = parse_webdataset(encode_webdataset(samples))
    assert out[0]["key"] == "shard0/a"
    assert set(out[0]["components"]) == {"seg.png", "txt"}


def test_interleaved_members_group_by_key():
    """Real shards interleave members after re-sharding: components of
    one key need not be adjacent."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name, data in [
            ("a.txt", b"A"),
            ("b.txt", b"B"),
            ("a.cls", b"1"),
            ("b.cls", b"2"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    out = parse_webdataset(buf.getvalue())
    assert [s["key"] for s in out] == ["a", "b"]  # first-appearance order
    assert out[0]["components"] == {"txt": b"A", "cls": b"1"}
    assert out[1]["components"] == {"txt": b"B", "cls": b"2"}


def test_truncation_and_poison_degrade():
    data = encode_webdataset(SAMPLES)
    for cut in (len(data) - 100, len(data) // 2, 100, 3):
        out = parse_webdataset(data[:cut])
        assert len(out) <= 2  # never raises; prefix only
    assert parse_webdataset(b"") == []
    assert parse_webdataset(b"\x00" * 2000) == []
    assert parse_webdataset(b"\x1f\x8bnot gzip") == []


def test_spark_sample_surface_and_decoder_composition(spark):
    """Samples flow into the existing decoders: a shard carrying a real
    WAV component decodes through audio_meta unchanged."""
    import numpy as np
    from pyspark.sql import functions as F

    from audit_star_spark.analytics.multimodal import audio_meta, encode_wav

    wav = encode_wav(np.array([100, -100] * 50, dtype="<i2"), 16000)
    shard = encode_webdataset(
        [
            {"key": "s0", "components": {"wav": wav, "txt": b"x"}},
            {"key": "s1", "components": {"txt": b"y"}},
        ]
    )
    media = spark.createDataFrame(
        [(1, bytearray(shard)), (2, bytearray(b"poison"))],
        "archive_id long, payload binary",
    )
    rows = webdataset_samples(media).collect()
    assert {(r["archive_id"], r["sample_key"]) for r in rows} == {
        (1, "s0"),
        (1, "s1"),
    }
    plan = webdataset_samples(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    wavs = (
        webdataset_samples(media)
        .select(
            F.col("archive_id").alias("doc_id"),
            F.element_at("components", F.lit("wav")).alias("payload"),
        )
        .filter(F.col("payload").isNotNull())
    )
    meta = audio_meta(wavs).collect()
    assert len(meta) == 1
    assert meta[0]["sample_rate"] == 16000 and meta[0]["n_samples"] == 100


def test_to_webdataset_shards_roundtrip_and_determinism(spark):
    from pyspark.sql import functions as F

    from audit_star_spark.sources.webdataset import (
        parse_webdataset,
        to_webdataset_shards,
    )
    from tests.conftest import SF_DIR

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
    )
    shards = {
        r["shard_id"]: r
        for r in to_webdataset_shards(docs, samples_per_shard=15, gz=True).collect()
    }
    assert sorted(shards) == [0, 1, 2]
    assert sum(r["n_samples"] for r in shards.values()) == 40
    got = {}
    for r in shards.values():
        for s in parse_webdataset(bytes(r["payload"])):
            got[int(s["key"])] = s["components"]["txt"].decode()
    want = {int(r["doc_id"]): r["text"] for r in docs.collect()}
    assert got == want
    again = {
        r["shard_id"]: bytes(r["payload"])
        for r in to_webdataset_shards(docs, samples_per_shard=15, gz=True).collect()
    }
    assert {k: bytes(v["payload"]) for k, v in shards.items()} == again
