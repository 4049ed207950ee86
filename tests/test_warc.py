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


# --------------------------------------------------------- HTTP envelope


def _env(status=200, body=b"hello world", **kw):
    from audit_star_spark.sources.warc import (
        encode_http_response,
        parse_http_response,
    )

    return parse_http_response(encode_http_response(status, body, **kw))


def test_http_roundtrip_identity():
    env = _env(200, b"<html>hi</html>")
    assert env["status"] == 200
    assert env["mime"] == "text/html"
    assert env["charset"] == "utf-8"
    assert env["content_encoding"] is None
    assert env["body"] == b"<html>hi</html>"


def test_http_gzip_content_encoding_decodes():
    body = b"compressible " * 100
    env = _env(200, body, gzip_body=True)
    assert env["content_encoding"] == "gzip"
    assert env["body"] == body


def test_http_chunked_transfer_decodes():
    body = bytes(range(256)) * 3
    env = _env(206, body, chunked=True, content_type="application/octet-stream")
    assert env["status"] == 206
    assert env["mime"] == "application/octet-stream"
    assert env["charset"] is None
    assert env["body"] == body


def test_http_chunked_then_gzip_rfc_order():
    """RFC 9112: transfer decoding first, then content decoding."""
    body = b"layered " * 50
    env = _env(200, body, gzip_body=True, chunked=True)
    assert env["body"] == body


def test_http_deflate_both_wrappings():
    import zlib

    from audit_star_spark.sources.warc import parse_http_response

    body = b"deflated " * 30
    for wire in (zlib.compress(body), zlib.compress(body)[2:-4]):
        raw = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Content-Encoding: deflate\r\n\r\n" + wire
        )
        assert parse_http_response(raw)["body"] == body


def test_http_envelope_poison_degrades_never_raises():
    from audit_star_spark.sources.warc import parse_http_response

    # not HTTP at all -> None (bare-content archive)
    assert parse_http_response(b"<html>no envelope</html>") is None
    assert parse_http_response(b"") is None
    # garbage status -> None
    assert parse_http_response(b"HTTP/1.1 xx OK\r\n\r\nbody") is None
    # corrupt gzip: encoding surfaced, raw bytes kept
    raw = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n\x1f\x8bBROKEN"
    )
    env = parse_http_response(raw)
    assert env["content_encoding"] == "gzip"
    assert env["body"] == b"\x1f\x8bBROKEN"
    # truncated chunk frame: decoded prefix only
    raw = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\nffff\r\nxx"
    )
    assert parse_http_response(raw)["body"] == b"hello"
    # headers but no CRLFCRLF: empty body
    assert parse_http_response(b"HTTP/1.1 204 No Content\r\nX: y")["body"] == b""


def test_http_responses_dataframe_surface(spark):
    """warc_records -> http_responses: envelope columns parsed, bodies
    decoded, non-HTTP payloads pass through with NULL status."""
    from audit_star_spark.sources.warc import (
        encode_http_response,
        http_responses,
    )

    recs = [
        {
            "warc_type": "warcinfo",
            "payload": b"software: test\r\n",  # filtered: not response
        },
        {
            "warc_type": "response",
            "target_uri": "https://example.org/gz",
            "payload": encode_http_response(200, b"page one", gzip_body=True),
        },
        {
            "warc_type": "response",
            "target_uri": "https://example.org/404",
            "payload": encode_http_response(
                404, b"missing", content_type="text/plain", reason="Not Found"
            ),
        },
        {
            "warc_type": "response",
            "target_uri": "https://example.org/bare",
            "payload": b"no envelope here",
        },
    ]
    df = spark.createDataFrame(
        [(7, encode_warc(recs))], "archive_id long, payload binary"
    )
    got = {
        r["target_uri"]: r
        for r in http_responses(warc_records(df)).collect()
    }
    assert set(got) == {
        "https://example.org/gz",
        "https://example.org/404",
        "https://example.org/bare",
    }
    gz = got["https://example.org/gz"]
    assert (gz["http_status"], gz["content_encoding"], bytes(gz["body"])) == (
        200,
        "gzip",
        b"page one",
    )
    nf = got["https://example.org/404"]
    assert (nf["http_status"], nf["mime"], bytes(nf["body"])) == (
        404,
        "text/plain",
        b"missing",
    )
    bare = got["https://example.org/bare"]
    assert bare["http_status"] is None
    assert bytes(bare["body"]) == b"no envelope here"


def test_warc_http_html_quality_pipeline(spark):
    """The flagship crawl composition: WARC archives of gzip'd HTML HTTP
    responses -> http_responses -> html_extract -> gopher quality — and
    the extracted text + quality signals equal running the same
    operators directly on the raw page text (the envelope layer is
    transparent)."""
    from pyspark.sql import functions as F

    from audit_star_spark.analytics.html import html_extract
    from audit_star_spark.analytics.quality import gopher_quality_flags
    from audit_star_spark.sources.warc import (
        encode_http_response,
        http_responses,
    )
    from tests.conftest import SF_DIR

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 40)
    )
    pages = {
        int(r["doc_id"]): "<html><head><title>t%d</title></head><body><p>%s</p>"
        '<a href="/next">n</a></body></html>' % (r["doc_id"], r["text"])
        for r in docs.collect()
    }
    archives = [
        (
            did,
            encode_warc(
                [
                    {
                        "warc_type": "response",
                        "target_uri": f"https://example.org/{did}",
                        "payload": encode_http_response(
                            200, page.encode(), gzip_body=did % 2 == 0
                        ),
                    }
                ],
                gzip_members=did % 3 == 0,
            ),
        )
        for did, page in pages.items()
    ]
    adf = spark.createDataFrame(archives, "archive_id long, payload binary")
    crawled = http_responses(warc_records(adf)).filter(
        (F.col("http_status") == 200) & (F.col("mime") == "text/html")
    )
    extracted = html_extract(
        crawled.select(
            F.col("archive_id").alias("doc_id"),
            F.col("body").cast("string").alias("html"),
        ),
        "html",
    )
    via_warc = gopher_quality_flags(extracted.select("doc_id", "text"))
    direct = gopher_quality_flags(
        html_extract(
            spark.createDataFrame(
                list(pages.items()), "doc_id long, html string"
            ),
            "html",
        ).select("doc_id", "text")
    )
    a = sorted(map(tuple, via_warc.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) == 40


def test_http_responses_streaming_crawl(spark, tmp_path):
    """The full crawl chain under Structured Streaming: binaryFile
    readStream -> warc_records -> http_responses -> foreachBatch.
    Envelope decode (gzip bodies) happens inside the micro-batch; the
    drained rows equal the batch run over the same archives."""
    from audit_star_spark.sources.warc import (
        encode_http_response,
        http_responses,
    )

    for i in range(3):
        recs = [
            {
                "warc_type": "response",
                "target_uri": f"https://example.org/{i}",
                "payload": encode_http_response(
                    200, f"page {i}".encode(), gzip_body=i % 2 == 0
                ),
            }
        ]
        (tmp_path / f"c{i}.warc").write_bytes(encode_warc(recs))

    raw_schema = (
        "path string, modificationTime timestamp, length long, content binary"
    )
    got = []
    stream = (
        spark.readStream.format("binaryFile")
        .schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(tmp_path))
        .selectExpr("abs(hash(path)) AS archive_id", "content AS payload")
    )
    q = (
        http_responses(warc_records(stream))
        .writeStream.foreachBatch(
            lambda df, bid: got.extend(
                (r["target_uri"], r["http_status"], bytes(r["body"]))
                for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(got) == [
        (f"https://example.org/{i}", 200, f"page {i}".encode())
        for i in range(3)
    ]


def test_crawl_chain_is_narrow_until_aggregation(spark):
    """Plan lock: WARC -> HTTP -> html_extract is one narrow pass — no
    Exchange anywhere in the chain (the 100 TB contract: archive splits
    decode independently; the first shuffle belongs to the report)."""
    from pyspark.sql import functions as F

    from audit_star_spark.analytics.html import html_extract
    from audit_star_spark.sources.warc import (
        encode_http_response,
        http_responses,
    )

    page = b"<html><body><p>hello world</p></body></html>"
    rec = {
        "warc_type": "response",
        "target_uri": "https://example.org/x",
        "payload": encode_http_response(200, page, gzip_body=True),
    }
    df = spark.createDataFrame(
        [(1, encode_warc([rec]))], "archive_id long, payload binary"
    )
    chain = html_extract(
        http_responses(warc_records(df))
        .filter(F.col("http_status") == 200)
        .select(
            F.col("archive_id").alias("doc_id"),
            F.col("body").cast("string").alias("html"),
        ),
        "html",
    )
    assert chain.count() == 1
    plan = chain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_to_warc_shards_roundtrip_and_determinism(spark):
    """Write side: re-shard (id, text) rows into WARC archives, read
    them back through the REAL warc_records -> http_responses chain and
    recover every document; shard bytes are run-to-run identical."""
    from pyspark.sql import functions as F

    from audit_star_spark.sources.warc import http_responses, to_warc_shards
    from tests.conftest import SF_DIR

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    shards = to_warc_shards(docs, docs_per_shard=16).collect()
    assert sorted(r["shard_id"] for r in shards) == [0, 1, 2, 3]
    assert sum(r["n_records"] for r in shards) == 50
    # round-trip through the real readers
    adf = spark.createDataFrame(
        [(r["shard_id"], bytes(r["payload"])) for r in shards],
        "archive_id long, payload binary",
    )
    got = {
        int(r["target_uri"].rsplit("/", 1)[1]): bytes(r["body"]).decode()
        for r in http_responses(warc_records(adf)).collect()
    }
    want = {int(r["doc_id"]): r["text"] for r in docs.collect()}
    assert got == want
    # determinism: a second run produces byte-identical shards
    again = {
        r["shard_id"]: bytes(r["payload"])
        for r in to_warc_shards(docs, docs_per_shard=16).collect()
    }
    for r in shards:
        assert again[r["shard_id"]] == bytes(r["payload"])


def test_shard_id_integer_floor_division(spark):
    """ADVICE r8: shard = id // docs_per_shard must be exact integer
    floor division — double division loses precision past 2^53 and
    truncates (not floors) negative ids."""
    from audit_star_spark.sources.warc import to_warc_shards

    big = (1 << 53) + 1  # 2^53 + 1: double rounds this to 2^53
    docs = spark.createDataFrame(
        [(big, "a"), (big + 1, "b"), (-5, "c"), (-1, "d")],
        "doc_id long, text string",
    )
    got = {
        r["shard_id"]: r["n_records"]
        for r in to_warc_shards(docs, docs_per_shard=2).collect()
    }
    # floor semantics: (2^53+1)//2 != 2^53//2, -5//2 = -3, -1//2 = -1
    assert got == {big // 2: 1, (big + 1) // 2: 1, -3: 1, -1: 1}
