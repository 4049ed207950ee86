"""DoReMi domain reweighting (analytics/doremi.py): pure-Python
replication of the exponentiated-gradient updates at 1e-12, simplex
invariants, monotone ordering (higher excess loss => higher weight),
the zero-excess fixed point, the SQL generator's parity through DuckDB,
and validation errors."""

import math

import duckdb
import pytest

from audit_star_spark.analytics.doremi import (
    domain_excess_loss,
    doremi_sql_iterations,
    doremi_weights,
)


def _py_doremi(excess, n_steps=4, lr=1.0, smoothing=0.1):
    d = len(excess)
    w = {k: 1.0 / d for k in excess}
    steps = []
    for _ in range(n_steps):
        un = {k: w[k] * math.exp(lr * excess[k]) for k in excess}
        z = math.fsum(sorted(un.values()))
        w = {
            k: (1.0 - smoothing) * un[k] / z + smoothing / d for k in excess
        }
        steps.append(dict(w))
    avg = {
        k: math.fsum(sorted(s[k] for s in steps)) / n_steps for k in excess
    }
    return w, avg


@pytest.fixture(scope="module")
def excess_df(spark):
    return spark.createDataFrame(
        [("a", 0.5), ("b", 0.0), ("c", 1.2), ("d", 0.1)],
        "domain string, excess double",
    )


def test_matches_python_reference(spark, excess_df):
    rows = {
        r["domain"]: r for r in doremi_weights(excess_df, n_steps=4).collect()
    }
    fin, avg = _py_doremi({"a": 0.5, "b": 0.0, "c": 1.2, "d": 0.1})
    for k in fin:
        assert rows[k]["final_weight"] == pytest.approx(fin[k], rel=1e-12)
        assert rows[k]["avg_weight"] == pytest.approx(avg[k], rel=1e-12)


def test_simplex_and_ordering(spark, excess_df):
    rows = {
        r["domain"]: r for r in doremi_weights(excess_df, n_steps=4).collect()
    }
    assert sum(r["final_weight"] for r in rows.values()) == pytest.approx(1.0)
    assert sum(r["avg_weight"] for r in rows.values()) == pytest.approx(1.0)
    # higher excess loss -> strictly higher weight
    order = sorted(rows, key=lambda k: rows[k]["final_weight"])
    assert order == ["b", "d", "a", "c"]


def test_zero_excess_is_uniform_fixed_point(spark):
    df = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0), ("c", 0.0)], "domain string, excess double"
    )
    rows = doremi_weights(df, n_steps=3).collect()
    for r in rows:
        assert r["final_weight"] == pytest.approx(1.0 / 3, rel=1e-12)
        assert r["avg_weight"] == pytest.approx(1.0 / 3, rel=1e-12)


def test_sql_generator_matches_spark(spark, excess_df):
    got = {
        r["domain"]: r for r in doremi_weights(excess_df, n_steps=4).collect()
    }
    sql = doremi_sql_iterations(
        "excess AS (SELECT * FROM (VALUES ('a', 0.5), ('b', 0.0), "
        "('c', 1.2), ('d', 0.1)) AS t(domain, excess))",
        n_steps=4,
    )
    for row in duckdb.sql(sql).fetchall():
        k, fin, avg = row
        assert got[k]["final_weight"] == pytest.approx(fin, rel=1e-12)
        assert got[k]["avg_weight"] == pytest.approx(avg, rel=1e-12)


def test_domain_excess_loss_clamps_and_counts(spark):
    scored = spark.createDataFrame(
        [
            (1, "a", 3.0),
            (2, "a", 5.0),
            (3, "b", 1.0),
            (4, "b", None),  # token-poor doc: counted, not averaged
        ],
        "doc_id long, source string, avg_nll double",
    )
    rows = {
        r["domain"]: r for r in domain_excess_loss(scored, 2.0).collect()
    }
    assert rows["a"]["excess"] == pytest.approx(2.0)  # mean 4 - ref 2
    assert rows["b"]["excess"] == 0.0  # mean 1 - ref 2 clamps to 0
    assert rows["b"]["n_docs"] == 2


def test_validation_errors(spark, excess_df):
    with pytest.raises(ValueError, match="n_steps"):
        doremi_weights(excess_df, n_steps=0)
    with pytest.raises(ValueError, match="smoothing"):
        doremi_weights(excess_df, smoothing=1.0)
    empty = excess_df.filter("excess > 99")
    with pytest.raises(ValueError, match="no domains"):
        doremi_weights(empty)
