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
