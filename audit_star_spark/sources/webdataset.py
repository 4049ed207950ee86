"""WebDataset tar-shard source — the de-facto sample format for
petabyte-scale multimodal training sets (a plain tar whose members group
into samples by basename: ``000017.jpg`` + ``000017.txt`` +
``000017.json`` are one sample with components jpg/txt/json).

Pure stdlib (tarfile), both directions:

- :func:`encode_webdataset` — samples -> tar bytes (optionally gzip), the
  deterministic test-vector generator (zeroed mtimes/uids);
- :func:`parse_webdataset` — tar bytes -> samples, grouping members by
  key prefix; corrupt/truncated tails yield the parseable prefix (the
  repo-wide decoder contract), never a raised task;
- :func:`webdataset_samples` — DataFrame[(archive_id, payload)] -> one
  row per sample with a ``components`` map<string, binary>, via narrow
  Arrow-batched mapInPandas — the same shard-per-task parallelism the
  WebDataset loader uses, expressed as a DataFrame scan.

Scale: shards are the unit of parallelism (WebDataset ships ~1 GB tars);
a 100 TB corpus is ~100k shard rows fanned over executors, each parsed
sequentially in-memory. Components stay opaque bytes — decode (JPEG, WAV,
JSON) composes downstream with the existing multimodal operators.
"""

from __future__ import annotations

import gzip
import io
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import types as T

WEBDATASET_SCHEMA = T.StructType(
    [
        T.StructField("archive_id", T.LongType()),
        T.StructField("sample_key", T.StringType()),
        T.StructField("n_components", T.IntegerType()),
        T.StructField(
            "components", T.MapType(T.StringType(), T.BinaryType())
        ),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset convention: key = path up to the FIRST dot of the
    basename; component = everything after it (so ``a/b.seg.png`` is key
    ``a/b``, component ``seg.png``)."""
    base = name.rsplit("/", 1)[-1]
    dirpart = name[: len(name) - len(base)]
    if "." in base:
        stem, ext = base.split(".", 1)
    else:
        stem, ext = base, ""
    return dirpart + stem, ext


_TAR_TEMPLATE: bytes | None = None


def _tar_header_template() -> bytes:
    """One zero-name zero-size member header written by tarfile itself;
    the fast encoder patches only name, size and checksum into copies of
    it, so every other field (mode, magic, uname, ...) is byte-identical
    to what ``tarfile`` would write."""
    global _TAR_TEMPLATE
    if _TAR_TEMPLATE is None:
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            info = tarfile.TarInfo(name="x")
            info.size = 0
            info.mtime = 0
            info.uid = info.gid = 0
            tar.addfile(info, io.BytesIO(b""))
        hdr = bytearray(buf.getvalue()[:512])
        hdr[0:100] = b"\0" * 100  # blank the name field
        _TAR_TEMPLATE = bytes(hdr)
    return _TAR_TEMPLATE


def _encode_tar(samples: list[dict]) -> bytes:
    """Tar assembly without per-member tarfile machinery: header =
    patched template (name, size, checksum), data padded to 512, the
    standard 1024-byte end marker, record-size padding — byte-identical
    to the tarfile writer. Members needing pax/GNU extensions (long or
    non-ASCII names, huge sizes) fall back to tarfile."""
    template = _tar_header_template()
    parts: list[bytes] = []
    total = 0
    for s in samples:
        for comp in sorted(s["components"]):
            data = s["components"][comp]
            name = f"{s['key']}.{comp}".encode("utf-8")
            if len(name) > 100 or len(data) > 0o77777777777:
                raise _TarFastUnsupported
            hdr = bytearray(template)
            hdr[0 : len(name)] = name
            hdr[124:136] = b"%011o\0" % len(data)
            hdr[148:156] = b" " * 8
            hdr[148:156] = b"%06o\0 " % sum(hdr)
            parts.append(bytes(hdr))
            parts.append(data)
            pad = -len(data) % 512
            if pad:
                parts.append(b"\0" * pad)
            total += 512 + len(data) + pad
    parts.append(b"\0" * 1024)
    total += 1024
    parts.append(b"\0" * (-total % tarfile.RECORDSIZE))
    return b"".join(parts)


class _TarFastUnsupported(Exception):
    """Member shape the patched-template writer cannot express."""


def encode_webdataset(samples: list[dict], gz: bool = False) -> bytes:
    """``samples``: dicts of ``key`` (str) + ``components`` (dict of
    component-name -> bytes). Members are emitted sample-by-sample in
    sorted component order with zeroed metadata, so archives are
    byte-deterministic."""
    try:
        out = _encode_tar(samples)
    except _TarFastUnsupported:
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for s in samples:
                for comp in sorted(s["components"]):
                    data = s["components"][comp]
                    info = tarfile.TarInfo(name=f"{s['key']}.{comp}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    tar.addfile(info, io.BytesIO(data))
        out = buf.getvalue()
    if gz:
        zbuf = io.BytesIO()
        with gzip.GzipFile(fileobj=zbuf, mode="wb", mtime=0) as z:
            z.write(out)
        return zbuf.getvalue()
    return out


def parse_webdataset(data: bytes) -> list[dict]:
    """Tar (or tar.gz, sniffed) bytes -> ordered samples
    ``{key, components: {name: bytes}}``. Sample order follows first
    appearance; members of a key need not be adjacent (real shards
    interleave after re-sharding). Truncated archives yield the complete
    leading members."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError):
            import zlib

            d = zlib.decompressobj(31)
            try:
                data = d.decompress(data)
            except zlib.error:
                return []
    try:
        members = _walk_tar(data)
    except _TarFastUnsupported:
        members = _walk_tar_tarfile(data)
    order: list[str] = []
    grouped: dict[str, dict[str, bytes]] = {}
    for name, payload in members:
        key, comp = _split_key(name)
        if key not in grouped:
            grouped[key] = {}
            order.append(key)
        grouped[key][comp] = payload
    return [{"key": k, "components": grouped[k]} for k in order]


def _walk_tar(data: bytes) -> list[tuple[str, bytes]]:
    """Plain-ustar member walk over raw bytes — no per-member tarfile
    object machinery. Mirrors the tarfile-based walk's observable
    behavior exactly: a bad FIRST header yields no members (tarfile
    fails at open), a bad later header or a truncated member keeps the
    complete leading members. Anything beyond a plain regular-file
    header (pax/GNU extensions, ustar prefix field, base-256 sizes)
    raises ``_TarFastUnsupported`` so the tarfile walk handles it."""
    out: list[tuple[str, bytes]] = []
    off = 0
    n = len(data)
    while True:
        hdr = data[off : off + 512]
        if len(hdr) < 512 or hdr.count(0) == 512:
            break  # end-of-archive marker or truncated tail
        try:
            chksum = int(hdr[148:156].split(b"\0")[0].strip() or b"-1", 8)
        except ValueError:
            chksum = -1
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        unsigned = sum(blanked)
        signed = sum(b - 256 if b > 127 else b for b in blanked)
        if chksum not in (unsigned, signed):
            if off == 0:
                break  # tarfile would fail at open: no members
            break  # corrupt tail: keep what we have
        typeflag = hdr[156]
        if typeflag not in (0x30, 0x00):  # REGTYPE / AREGTYPE only
            raise _TarFastUnsupported
        if hdr[345] != 0 or hdr[124] & 0x80:
            raise _TarFastUnsupported  # ustar prefix / base-256 size
        try:
            name = hdr[:100].split(b"\0")[0].decode("utf-8")
            size = int(hdr[124:136].split(b"\0")[0].strip() or b"0", 8)
        except (ValueError, UnicodeDecodeError):
            raise _TarFastUnsupported from None
        body_end = off + 512 + size
        if body_end > n:
            break  # truncated member: keep the complete leading ones
        out.append((name, data[off + 512 : body_end]))
        off += 512 + size + (-size % 512)
    return out


def _walk_tar_tarfile(data: bytes) -> list[tuple[str, bytes]]:
    """The original tarfile-based member walk (general formats)."""
    out: list[tuple[str, bytes]] = []
    try:
        with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tar:
            while True:
                try:
                    info = tar.next()
                except (tarfile.TarError, EOFError, OSError):
                    break  # truncated/corrupt tail: keep what we have
                if info is None:
                    break
                if not info.isfile():
                    continue
                f = tar.extractfile(info)
                if f is None:
                    continue
                try:
                    payload = f.read()
                except (tarfile.TarError, EOFError, OSError):
                    break
                if len(payload) != info.size:
                    break  # truncated member
                out.append((info.name, payload))
    except (tarfile.TarError, EOFError, OSError, ValueError):
        return []
    return out


def webdataset_samples(
    archives: DataFrame,
    id_col: str = "archive_id",
    payload_col: str = "payload",
) -> DataFrame:
    """DataFrame[(archive_id, payload binary)] -> one row per sample:
    (archive_id, sample_key, n_components, components map). Narrow
    mapInPandas; poison archives contribute zero rows."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples = parse_webdataset(bytes(payload))
                except Exception:
                    samples = []
                for s in samples:
                    rows.append(
                        {
                            "archive_id": int(aid),
                            "sample_key": s["key"],
                            "n_components": len(s["components"]),
                            "components": s["components"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in WEBDATASET_SCHEMA.fields],
            )

    return archives.mapInPandas(gen, WEBDATASET_SCHEMA)


def to_webdataset_shards(
    docs: "DataFrame",
    samples_per_shard: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    gz: bool = False,
) -> "DataFrame":
    """Distributed re-sharding writer — the WRITE side of the WebDataset
    surface: (id, text) rows -> one tar shard per ``samples_per_shard``
    contiguous ids, each sample carrying a ``txt`` component. Returns
    (shard_id, payload binary, n_samples).

    Shard assignment is ``id // samples_per_shard`` — deterministic and
    data-independent, so re-running produces byte-identical shards
    (zeroed tar metadata) and a failed job is safely re-runnable. One
    shuffle on shard_id (inherent to re-sharding: the rows of a shard
    must meet); assembly is applyInPandas per shard with members sorted
    by id, so shard bytes do not depend on upstream partitioning. At
    100 TB: shards ~ samples_per_shard x mean doc size — size it to the
    1 GB tar granularity the read side is optimized for."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if samples_per_shard < 1:
        raise ValueError("samples_per_shard must be >= 1")

    schema = T.StructType(
        [
            T.StructField("shard_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_samples", T.LongType()),
        ]
    )

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        samples = [
            {
                "key": f"{int(i):012d}",
                "components": {"txt": str(t).encode("utf-8")},
            }
            for i, t in zip(pdf[id_col], pdf[text_col])
        ]
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["__shard"].iloc[0])],
                "payload": [encode_webdataset(samples, gz=gz)],
                "n_samples": [len(samples)],
            }
        )

    staged = docs.select(
        F.col(id_col), F.col(text_col),
        # Exact integer floor division — see to_warc_shards.
        F.expr(
            f"(cast({id_col} as bigint) - pmod(cast({id_col} as bigint), "
            f"{int(samples_per_shard)})) div {int(samples_per_shard)}"
        ).alias("__shard"),
    )
    return staged.groupBy("__shard").applyInPandas(build, schema)
