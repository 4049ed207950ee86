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
