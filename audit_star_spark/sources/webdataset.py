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


def encode_webdataset(samples: list[dict], gz: bool = False) -> bytes:
    """``samples``: dicts of ``key`` (str) + ``components`` (dict of
    component-name -> bytes). Members are emitted sample-by-sample in
    sorted component order with zeroed metadata, so archives are
    byte-deterministic."""
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
    order: list[str] = []
    grouped: dict[str, dict[str, bytes]] = {}
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
                key, comp = _split_key(info.name)
                if key not in grouped:
                    grouped[key] = {}
                    order.append(key)
                grouped[key][comp] = payload
    except (tarfile.TarError, EOFError, OSError, ValueError):
        return []
    return [{"key": k, "components": grouped[k]} for k in order]


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
