"""Differential tests: every driver-gate query vs its DuckDB oracle at
sf0.001 — the local mirror of CORRECTNESS_r{N}.json."""

import pytest

from audit_star_spark.testing import compare, duckdb_connection
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


def _all_queries():
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,sql", _all_queries(), ids=[n for n, _, _ in _all_queries()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_DIR)
    if sql is None:
        # rows-only check (non-SQL-expressible operator)
        assert df.count() >= 0
        return
    compare(df, duck, sql, name=name)
