"""Bloom semi-join pre-filter (plans/bloom_join.py): exactness under
any sizing (including a saturated bitmap), recall of the probe filter,
bounded build, engine-differential candidate sets."""

import duckdb
import pytest
from pyspark.sql import functions as F

from audit_star_spark.plans.bloom_join import (
    bloom_build,
    bloom_pos_cte_sql,
    bloom_probe_filter,
    bloom_probe_sql,
    bloom_semi_join,
)
from tests.conftest import SF_DIR


def _tables(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    return li, part.filter("p_size = 1")


@pytest.mark.parametrize("m_bits,k", [(64, 2), (256, 4), (65536, 4)])
def test_semi_join_exact_at_any_sizing(spark, m_bits, k):
    """The bloom stage never changes the RESULT — even a tiny,
    saturated bitmap only weakens the pre-filter. Result always equals
    the plain semi-join."""
    li, small = _tables(spark)
    got = bloom_semi_join(li, small, "l_partkey", "p_partkey", m_bits, k)
    want = li.join(
        small.select(F.col("p_partkey").alias("l_partkey")).distinct(),
        "l_partkey",
        "left_semi",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_probe_filter_has_full_recall(spark):
    """No true match is ever dropped by the bloom stage (a Bloom filter
    has no false negatives): candidates ⊇ true matches."""
    li, small = _tables(spark)
    m_bits, k = 128, 3
    words = bloom_build(small, "p_partkey", m_bits, k)
    cand_keys = {
        r["l_partkey"]
        for r in bloom_probe_filter(li, "l_partkey", words, m_bits, k)
        .select("l_partkey")
        .distinct()
        .collect()
    }
    true_keys = {
        r["p_partkey"]
        for r in small.join(
            li.select(F.col("l_partkey").alias("p_partkey")).distinct(),
            "p_partkey",
            "left_semi",
        ).collect()
    }
    assert true_keys <= cand_keys


def test_build_is_bounded_by_bitmap_size(spark):
    """The driver-side materialization is capped at m_bits / 64 words
    no matter how many keys go in (the broadcast-bound contract)."""
    li, _ = _tables(spark)
    words = bloom_build(
        li.select(F.col("l_orderkey").alias("k")), "k", 128, 4
    )
    assert len(words) == 2
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)
    # many more keys than bits: the bitmap is (near) saturated
    assert sum(bin(w & ((1 << 64) - 1)).count("1") for w in words) > 100


def test_null_keys_never_pass(spark):
    df = spark.createDataFrame([(1,), (None,)], "k long")
    small = spark.createDataFrame([(1,)], "k long")
    words = bloom_build(small, "k", 64, 2)
    got = bloom_probe_filter(df, "k", words, 64, 2).collect()
    assert [r["k"] for r in got] == [1]


def test_candidates_match_duckdb_oracle(spark):
    """The intermediate candidate set itself is auditable: the SQL
    mirror reproduces it bit-for-bit from the same seeded positions."""
    li, small = _tables(spark)
    m_bits, k = 512, 4
    words = bloom_build(small, "p_partkey", m_bits, k)
    got = sorted(
        r["l_orderkey"] * 100 + r["l_linenumber"]
        for r in bloom_probe_filter(li, "l_partkey", words, m_bits, k)
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{SF_DIR}/part.parquet'")
    cte = bloom_pos_cte_sql(
        "SELECT p_partkey FROM part WHERE p_size = 1", "p_partkey", m_bits, k
    )
    pred = bloom_probe_sql("l_partkey", None, None, m_bits, k)
    want = sorted(
        r[0]
        for r in con.sql(
            f"WITH __bloom_pos AS ({cte}) "
            f"SELECT l_orderkey * 100 + l_linenumber FROM lineitem "
            f"WHERE {pred}"
        ).fetchall()
    )
    assert got == want


def test_m_bits_must_be_word_aligned(spark):
    small = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_build(small, "k", 100, 2)
