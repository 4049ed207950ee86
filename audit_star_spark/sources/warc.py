"""WARC (ISO 28500) web-archive reader/writer — the Common Crawl
interchange format every web-scale training corpus starts from.

A WARC file is a concatenation of records, each:

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...          (Content-Length mandatory)
    \\r\\n
    <Content-Length payload bytes>\\r\\n\\r\\n

Common Crawl ships each record as its own gzip member, concatenated —
readers must handle both plain and member-gzipped archives. This module
implements both, pure stdlib, plus the Spark surface:

- :func:`encode_warc` — records -> archive bytes (optionally per-record
  gzip members), the differential test-vector generator;
- :func:`parse_warc` — archive bytes -> records, tolerant of trailing
  garbage (truncated tail records are dropped, never raised — the
  poison-payload contract every decoder in this repo follows);
- :func:`warc_records` — DataFrame[archive binary] -> one row per record
  via mapInPandas: narrow, Arrow-batched, no shuffle. Each task parses
  only its own archives, so 100 TB of WARC scales with input splits
  exactly like the image/audio/video decoders (multimodal.py).

Cites: reference has no web-archive surface; this extends the mandated
LLM-pipeline layer (multimodal/corpus I/O family, SURVEY §2 additions).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("archive_id", T.LongType()),
        T.StructField("record_index", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def encode_warc(
    records: list[dict], gzip_members: bool = False
) -> bytes:
    """Records -> WARC archive bytes. Each record dict: ``warc_type``,
    ``target_uri`` (optional), ``warc_date`` (optional), ``content_type``
    (optional), ``payload`` (bytes). Per-record gzip members when
    ``gzip_members`` (the Common Crawl layout)."""
    out = io.BytesIO()
    for rec in records:
        payload = rec.get("payload", b"")
        head = [b"WARC/1.0"]
        head.append(b"WARC-Type: " + rec["warc_type"].encode())
        if rec.get("target_uri"):
            head.append(b"WARC-Target-URI: " + rec["target_uri"].encode())
        if rec.get("warc_date"):
            head.append(b"WARC-Date: " + rec["warc_date"].encode())
        if rec.get("content_type"):
            head.append(b"Content-Type: " + rec["content_type"].encode())
        head.append(b"Content-Length: " + str(len(payload)).encode())
        body = _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        if gzip_members:
            # mtime=0 for deterministic bytes (differential tests)
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(body)
            out.write(buf.getvalue())
        else:
            out.write(body)
    return out.getvalue()


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a time,
    stopping (without raising) at the first truncated or corrupt member
    — zlib's wbits=31 decoder sets ``eof``/``unused_data`` per member."""
    import zlib

    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(data[pos:]) + d.flush()
        except zlib.error:
            return
        if not d.eof:
            return  # truncated tail member
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def parse_warc(data: bytes, archive_id: int = 0) -> list[dict]:
    """Archive bytes -> record dicts (schema of WARC_RECORD_SCHEMA minus
    archive_id/record_index handled by the caller). Accepts plain
    archives and per-record-gzip archives (sniffed by magic); truncated
    tail records are dropped."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # multi-member: stdlib reads all
        except (OSError, EOFError):
            # salvage complete leading members
            data = b"".join(_split_gzip_members(data))
    out: list[dict] = []
    pos = 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        if body_start + clen > len(data):
            break  # truncated tail record
        out.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": clen,
                "payload": data[body_start : body_start + clen],
            }
        )
        pos = body_start + clen
    return out


def warc_records(
    archives: DataFrame,
    id_col: str = "archive_id",
    payload_col: str = "payload",
) -> DataFrame:
    """DataFrame[(archive_id, payload binary)] -> one row per WARC
    record. mapInPandas: narrow (no shuffle), Arrow-batched; a corrupt
    archive yields only its parseable prefix, never a task failure."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    recs = parse_warc(bytes(payload))
                except Exception:
                    recs = []  # poison payload: degrade to zero records
                for i, r in enumerate(recs):
                    rows.append(
                        {
                            "archive_id": int(aid),
                            "record_index": i,
                            "warc_type": r["warc_type"],
                            "target_uri": r["target_uri"],
                            "warc_date": r["warc_date"],
                            "content_type": r["content_type"],
                            "content_length": r["content_length"],
                            "payload": r["payload"],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return archives.mapInPandas(gen, WARC_RECORD_SCHEMA)


def read_warc_files(spark, path: str) -> DataFrame:
    """Read *.warc / *.warc.gz files from a directory via Spark's
    binaryFile source -> record rows. File-level parallelism; for
    many-GB single archives, split upstream (Common Crawl ships 1 GB
    files, which is the right task granularity)."""
    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .selectExpr(
            "abs(hash(path)) AS archive_id", "content AS payload", "path"
        )
    )
    return warc_records(raw)


# --------------------------------------------------------- HTTP envelope

HTTP_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("archive_id", T.LongType()),
        T.StructField("record_index", T.IntegerType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("content_encoding", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def encode_http_response(
    status: int,
    body: bytes,
    content_type: str = "text/html; charset=utf-8",
    gzip_body: bool = False,
    chunked: bool = False,
    reason: str = "OK",
) -> bytes:
    """Status + headers + body -> the raw HTTP/1.1 response bytes a
    Common Crawl ``response`` record carries as its payload — the
    differential test-vector generator for :func:`parse_http_response`.
    ``gzip_body`` adds ``Content-Encoding: gzip`` (deterministic mtime=0
    stream); ``chunked`` emits the body as two chunks with
    ``Transfer-Encoding: chunked`` (encoding order per RFC 9112: chunking
    is applied LAST, i.e. to the already-content-encoded bytes)."""
    wire = body
    head = [f"HTTP/1.1 {status} {reason}".encode()]
    head.append(b"Content-Type: " + content_type.encode())
    if gzip_body:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(wire)
        wire = buf.getvalue()
        head.append(b"Content-Encoding: gzip")
    if chunked:
        head.append(b"Transfer-Encoding: chunked")
        half = len(wire) // 2
        out = b""
        for chunk in (wire[:half], wire[half:]):
            if chunk:
                out += f"{len(chunk):x}".encode() + _CRLF + chunk + _CRLF
        wire = out + b"0" + _CRLF + _CRLF
    else:
        head.append(b"Content-Length: " + str(len(wire)).encode())
    return _CRLF.join(head) + _CRLF + _CRLF + wire


def _dechunk(data: bytes) -> bytes:
    """Decode a Transfer-Encoding: chunked body; on any malformed chunk
    frame, return what decoded so far (poison-payload contract)."""
    out = io.BytesIO()
    pos = 0
    while True:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            break
        size_tok = data[pos:eol].split(b";", 1)[0].strip()  # drop chunk exts
        try:
            n = int(size_tok, 16)
        except ValueError:
            break
        if n == 0:
            break  # terminal chunk; trailers ignored
        body_start = eol + 2
        if body_start + n > len(data):
            break  # truncated tail chunk
        out.write(data[body_start : body_start + n])
        pos = body_start + n + 2  # skip chunk-data CRLF
    return out.getvalue()


def parse_http_response(payload: bytes) -> dict | None:
    """A WARC ``response`` record's payload -> the parsed HTTP envelope:

    ``{"status": int, "mime": str|None, "charset": str|None,
    "content_encoding": str|None, "headers": dict, "body": bytes}``

    or None when the payload is not an HTTP response at all (some
    archives store bare content) — callers then treat the whole payload
    as the body. Envelope split is at the FIRST CRLFCRLF; transfer
    decoding runs before content decoding (RFC 9112 order);
    ``Content-Encoding: gzip``/``x-gzip``/``deflate`` are decompressed,
    any other value (or a corrupt stream) leaves the body bytes as-is
    with the encoding surfaced so the caller can filter — never a task
    failure (poison-payload contract)."""
    if not payload.startswith(b"HTTP/"):
        return None
    split = payload.find(_CRLF + _CRLF)
    if split < 0:
        head, body = payload, b""
    else:
        head, body = payload[:split], payload[split + 4 :]
    lines = head.split(_CRLF)
    status_parts = lines[0].split(None, 2)
    try:
        status = int(status_parts[1])
    except (IndexError, ValueError):
        return None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").strip().lower() or None
    if enc in ("gzip", "x-gzip", "deflate"):
        import zlib

        try:
            if enc == "deflate":
                try:
                    body = zlib.decompress(body)
                except zlib.error:
                    body = zlib.decompress(body, -zlib.MAX_WBITS)  # raw
            else:
                body = gzip.decompress(body)
        except (OSError, EOFError, zlib.error):
            pass  # corrupt stream: surface encoding, keep raw bytes
    ctype = headers.get("content-type")
    mime = charset = None
    if ctype:
        mime = ctype.split(";", 1)[0].strip().lower() or None
        for part in ctype.split(";")[1:]:
            k, sep, v = part.partition("=")
            if sep and k.strip().lower() == "charset":
                charset = v.strip().strip("\"'").lower() or None
    return {
        "status": status,
        "mime": mime,
        "charset": charset,
        "content_encoding": enc,
        "headers": headers,
        "body": body,
    }


def http_responses(records: DataFrame) -> DataFrame:
    """WARC record rows (:func:`warc_records` output) -> one row per
    ``response`` record with the HTTP envelope parsed: status,
    mime/charset (from the HTTP header, NOT the WARC record header),
    content-encoding, and the transfer- and content-DECODED body bytes.
    A payload with no HTTP envelope (bare-content archives) surfaces
    with NULL status and the raw payload as body. mapInPandas: narrow,
    Arrow-batched, no shuffle — composes with html_extract / the quality
    operators downstream at input-split parallelism."""
    resp = records.filter(records["warc_type"] == "response")

    def gen(batches):
        import pandas as pd

        cols = [f.name for f in HTTP_RESPONSE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    env = parse_http_response(bytes(r.payload))
                except Exception:
                    env = None  # poison payload
                rows.append(
                    {
                        "archive_id": int(r.archive_id),
                        "record_index": int(r.record_index),
                        "target_uri": r.target_uri,
                        "warc_date": r.warc_date,
                        "http_status": env["status"] if env else None,
                        "mime": env["mime"] if env else None,
                        "charset": env["charset"] if env else None,
                        "content_encoding": (
                            env["content_encoding"] if env else None
                        ),
                        "body": env["body"] if env else bytes(r.payload),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return resp.mapInPandas(gen, HTTP_RESPONSE_SCHEMA)


def to_warc_shards(
    docs: DataFrame,
    docs_per_shard: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    gzip_members: bool = True,
) -> DataFrame:
    """Distributed re-sharding writer — the WRITE side of the WARC
    surface: (id, text) rows -> one archive per ``docs_per_shard``
    contiguous ids, each document a ``response`` record wrapping an
    HTTP 200 envelope (so the archives round-trip through
    warc_records -> http_responses). Returns (shard_id, payload binary,
    n_records).

    Deterministic: shard = id // docs_per_shard, records sorted by id,
    gzip members with mtime=0 — re-runs are byte-identical. One shuffle
    on shard_id (inherent); Common Crawl's ~1 GB archives set the
    target shard size."""
    from pyspark.sql import functions as F

    if docs_per_shard < 1:
        raise ValueError("docs_per_shard must be >= 1")

    schema = T.StructType(
        [
            T.StructField("shard_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_records", T.LongType()),
        ]
    )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        recs = [
            {
                "warc_type": "response",
                "target_uri": f"https://example.org/{int(i)}",
                "content_type": "application/http;msgtype=response",
                "payload": encode_http_response(
                    200,
                    str(t).encode("utf-8"),
                    content_type="text/plain; charset=utf-8",
                ),
            }
            for i, t in zip(pdf[id_col], pdf[text_col])
        ]
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["__shard"].iloc[0])],
                "payload": [encode_warc(recs, gzip_members=gzip_members)],
                "n_records": [len(recs)],
            }
        )

    staged = docs.select(
        F.col(id_col), F.col(text_col),
        # Exact integer floor division (id // docs_per_shard): double `/`
        # loses precision past 2^53 and truncates (not floors) negatives.
        # `id - pmod(id, n)` is exactly divisible by n, so `div` is exact.
        F.expr(
            f"(cast({id_col} as bigint) - pmod(cast({id_col} as bigint), "
            f"{int(docs_per_shard)})) div {int(docs_per_shard)}"
        ).alias("__shard"),
    )
    return staged.groupBy("__shard").applyInPandas(build, schema)
