"""k-means Lloyd iteration: full-array differential test (the driver gate
scalarizes the centroid; this pins every element against the oracle) plus
structural invariants."""

from pyspark.sql import functions as F

from audit_star_spark.analytics.similarity import kmeans_update
from audit_star_spark.queries_analytics import _kmeans_core_sql
from audit_star_spark.sources.testdata import load_table
from audit_star_spark.testing import compare, duckdb_connection
from tests.conftest import SF_DIR


def test_kmeans_full_centroid_arrays_match_oracle(spark):
    con = duckdb_connection(SF_DIR)
    try:
        compare(
            kmeans_update(load_table(spark, SF_DIR, "embeddings")),
            con,
            _kmeans_core_sql(),
            name="kmeans_core",
        )
    finally:
        con.close()


def test_kmeans_membership_partitions_corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = kmeans_update(emb).collect()
    assert sum(r["n_members"] for r in out) == emb.count()
    dims = {len(r["centroid"]) for r in out}
    assert dims == {emb.select(F.size("embedding")).first()[0]}
    assert len(out) <= 16 and len(out) >= 1
