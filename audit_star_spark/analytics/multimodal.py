"""Multimodal column handling (north-star layer): images/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
pandas functions over ``mapInPandas``.

The decode step itself (image/audio libraries) is STUBBED — the container
has no codec libs — but the Spark-side plumbing is real and tested: binary
payload schema, mapInPandas batch iteration, output schema contract,
partition-preserving narrow execution. ``decode_image`` raises
NotImplementedError; ``extract_features`` is the deterministic stand-in
with the identical plumbing shape.

Scale notes: mapInPandas is narrow (no shuffle); batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so executor memory is
independent of partition size. Binary payloads stay off the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("head_mean", T.DoubleType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode would go here (PIL/libjpeg). STUB: the container
    ships no codec libraries."""
    raise NotImplementedError(
        "image decode requires codec libraries not present in this "
        "environment; use extract_features for the deterministic stand-in"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: text re-encoded as an opaque binary
    payload column + typed metadata (what an image/audio table looks like:
    (id, payload binary, meta...))."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.col("source").alias("media_source"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize would decode + rescale + re-encode (PIL). STUB: no
    codec libraries in this environment."""
    raise NotImplementedError(
        "image resize requires codec libraries not present in this "
        "environment; the mapInPandas plumbing shape is sample_frames"
    )


def sample_frames(media: DataFrame, frame_size: int = 64, every_n: int = 4) -> DataFrame:
    """Frame sampling over binary payloads: treat each payload as a
    sequence of fixed-size frames and emit every ``every_n``-th one —
    the deterministic stand-in for video frame extraction, with the REAL
    plumbing a decoder would need: 1:N Arrow-batched ``mapInPandas``
    (one input row fans out to many frame rows), narrow execution, and
    per-frame metadata. Swap the slicing for a codec call and the Spark
    side is unchanged."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, sizes, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_n):
                    frame = data[i * frame_size : (i + 1) * frame_size]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sizes.append(len(frame))
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the
    deterministic stand-in for a decode+embed stage. Computes byte length,
    md5, and the mean of the first 16 byte values."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_mean": payloads.map(
                        lambda b: float(sum(bytes(b)[:16])) / min(len(b), 16)
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
