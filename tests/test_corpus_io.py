"""JSONL corpus export/read-back round-trip and k-means training loop."""

import glob

from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import kmeans_train, kmeans_update
from audit_star_spark.sources.corpus_io import export_jsonl, read_jsonl
from audit_star_spark.sources.testdata import load_table
from tests.conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_jsonl_round_trip_sharded_gzip(spark, tmp_path):
    out = str(tmp_path / "corpus")
    docs = load_table(spark, SF_DIR, "documents")
    export_jsonl(docs, out, shards=4)
    parts = glob.glob(out + "/part-*.json.gz")
    assert len(parts) == 4
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert back.schema == docs.select(*back.columns).schema
    orig = {tuple(r) for r in docs.select(*sorted(docs.columns)).collect()}
    got = {tuple(r) for r in back.select(*sorted(back.columns)).collect()}
    assert got == orig


def test_export_jsonl_rejects_nonpositive_shards(spark):
    import pytest as _pytest

    from audit_star_spark.sources.corpus_io import export_jsonl

    df = spark.range(3)
    with _pytest.raises(ValueError):
        export_jsonl(df, "/tmp/never-written", shards=0)
    with _pytest.raises(ValueError):
        export_jsonl(df, "/tmp/never-written", shards=-2)


def test_kmeans_train_iterates_and_converges_structurally(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents, shifts = kmeans_train(emb, iters=3)
    rows = cents.collect()
    # membership still partitions the corpus after every round
    assert sum(r["n_members"] for r in rows) == emb.count()
    assert len(shifts) == 3 and all(s >= 0.0 for s in shifts)
    # round 1 of training IS the single Lloyd step (same seed, same step)
    one, _ = kmeans_train(emb, iters=1)
    single = kmeans_update(emb)
    a = {r["cell_id"]: (r["n_members"], tuple(r["centroid"])) for r in one.collect()}
    b = {r["cell_id"]: (r["n_members"], tuple(r["centroid"])) for r in single.collect()}
    assert a == b


def test_shard_manifest_is_reproducible(spark, tmp_path):
    """Byte-deterministic export => identical manifest on re-export
    (the auditable-release property); manifest covers every data shard
    with its real md5."""
    import hashlib
    import os

    from audit_star_spark.sources.corpus_io import export_jsonl, shard_manifest

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    ).orderBy("doc_id")
    out = str(tmp_path / "rel")
    export_jsonl(df.repartition(1).sortWithinPartitions("doc_id"), out, shards=None)
    m1 = sorted(map(tuple, shard_manifest(spark, out).collect()))
    assert len(m1) >= 1 and all(len(r[2]) == 32 for r in m1)
    # md5 matches a direct file hash
    shard, n_bytes, md5 = m1[0]
    fp = os.path.join(out, shard)
    raw = open(fp, "rb").read()
    assert len(raw) == n_bytes and hashlib.md5(raw).hexdigest() == md5
    # re-export reproduces the manifest bit-for-bit
    out2 = str(tmp_path / "rel2")
    export_jsonl(df.repartition(1).sortWithinPartitions("doc_id"), out2, shards=None)
    m2 = sorted(map(tuple, shard_manifest(spark, out2).collect()))
    assert [r[1:] for r in m1] == [r[1:] for r in m2]
