"""WARC source (sources/warc.py): byte-level roundtrip both layouts,
truncation/poison degradation, the Spark record surface, and the
binaryFile directory reader."""

import gzip

from audit_star_spark.sources.warc import (
    encode_warc,
    parse_warc,
    read_warc_files,
    warc_records,
)

RECS = [
    {
        "warc_type": "warcinfo",
        "content_type": "application/warc-fields",
        "payload": b"software: test\r\n",
    },
    {
        "warc_type": "response",
        "target_uri": "https://example.org/a",
        "warc_date": "2024-01-01T00:00:00Z",
        "content_type": "text/html",
        "payload": b"<html>x</html>",
    },
    {
        "warc_type": "response",
        "target_uri": "https://example.org/b",
        "payload": bytes(range(256)) * 4,  # binary payload survives
    },
]


def test_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        out = parse_warc(encode_warc(RECS, gzip_members=gz))
        assert [r["warc_type"] for r in out] == [
            "warcinfo",
            "response",
            "response",
        ], gz
        assert out[2]["payload"] == bytes(range(256)) * 4
        assert out[1]["target_uri"] == "https://example.org/a"
        assert all(r["content_length"] == len(r["payload"]) for r in out)


def test_whole_archive_gzip_also_parses():
    """A singly-gzipped archive (not per-record members) must parse too
    — gzip.decompress reads multi-member and single-member alike."""
    data = gzip.compress(encode_warc(RECS))
    assert len(parse_warc(data)) == 3


def test_truncation_drops_tail_never_raises():
    for gz in (False, True):
        data = encode_warc(RECS, gzip_members=gz)
        for cut in (len(data) - 300, len(data) // 2, 10, 3):
            out = parse_warc(data[:cut])
            assert len(out) <= 3
            assert all(
                r["content_length"] == len(r["payload"]) for r in out
            )


def test_poison_payloads_parse_to_empty():
    assert parse_warc(b"") == []
    assert parse_warc(b"\x00" * 100) == []
    assert parse_warc(b"\x1f\x8bnot gzip at all") == []
    assert parse_warc(b"WARC/1.0\r\nContent-Length: oops\r\n\r\n") == []


def test_warc_records_dataframe_surface(spark):
    good = encode_warc(RECS, gzip_members=True)
    rows = (
        warc_records(
            spark.createDataFrame(
                [(1, bytearray(good)), (2, bytearray(b"\x00poison"))],
                "archive_id long, payload binary",
            )
        )
        .orderBy("archive_id", "record_index")
        .collect()
    )
    assert [(r["archive_id"], r["record_index"]) for r in rows] == [
        (1, 0),
        (1, 1),
        (1, 2),
    ]
    assert rows[1]["target_uri"] == "https://example.org/a"
    assert bytes(rows[2]["payload"]) == bytes(range(256)) * 4


def test_read_warc_files_directory(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(encode_warc(RECS))
    (tmp_path / "b.warc.gz").write_bytes(
        encode_warc(RECS[:2], gzip_members=True)
    )
    out = read_warc_files(spark, str(tmp_path)).collect()
    assert len(out) == 5
    assert {r["warc_type"] for r in out} == {"warcinfo", "response"}


def test_warc_records_plan_is_narrow(spark):
    good = encode_warc(RECS)
    df = warc_records(
        spark.createDataFrame(
            [(1, bytearray(good))], "archive_id long, payload binary"
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # parse is shuffle-free


def test_warc_records_streaming_ingest(spark, tmp_path):
    """The record surface works under Structured Streaming: binaryFile
    readStream -> warc_records -> foreachBatch, multi-batch."""
    import glob

    for i in range(3):
        (tmp_path / f"a{i}.warc").write_bytes(encode_warc(RECS))
    seen = []

    raw = (
        spark.readStream.format("binaryFile")
        # streaming sources need an explicit schema; this is binaryFile's
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", 1)
        .load(str(tmp_path))
        .selectExpr("abs(hash(path)) AS archive_id", "content AS payload")
    )
    recs = warc_records(raw)
    q = (
        recs.writeStream.foreachBatch(
            lambda df, bid: seen.append(df.count())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(seen) == 9  # 3 archives x 3 records
    assert len(seen) >= 3  # one file per trigger
