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


def _check_capped_sessions(spark, df):
    """Semantic twin for the one oracle-less query: replay the capped
    sessionizer SEQUENTIALLY on the driver (per-user, ts-sorted, the same
    split rules) and require the distributed mapInPandas result to match
    row-for-row — this fails if the repartition/sort/group plumbing ever
    drifts. The streaming ≡ batch half lives in test_streaming_sessions."""
    import pandas as pd

    from audit_star_spark.streaming.sessions import _split_sessions

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts"], kind="mergesort")
    )
    want_rows = []
    for uid, g in events.groupby("user_id", sort=True):
        want_rows.extend(_split_sessions(uid, g, 500.0))
    want = pd.DataFrame(want_rows)
    got = df.toPandas()
    key = list(got.columns)
    got = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    want = want[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _check_compression_ratio(spark, df):
    """Driver-side zlib replay: the distributed result must equal a
    sequential recomputation over the same corpus byte-for-byte."""
    import zlib

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    got = {r["doc_id"]: r for r in df.collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        raw = (text or "").encode("utf-8")
        comp = zlib.compress(raw, 6)
        r = got[doc_id]
        assert r["n_raw_bytes"] == len(raw)
        assert r["n_zlib_bytes"] == len(comp)
        if raw:
            assert abs(r["zlib_ratio"] - len(comp) / len(raw)) < 1e-9


# oracle-less queries each need a registered semantic check — a bare
# count() is a tautology, not a test
_SEMANTIC_CHECKS = {
    "capped_user_sessions": _check_capped_sessions,
    "compression_ratio": _check_compression_ratio,
}


@pytest.mark.parametrize("name,fn,sql", _all_queries(), ids=[n for n, _, _ in _all_queries()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_DIR)
    if sql is None:
        _SEMANTIC_CHECKS[name](spark, df)
        return
    compare(df, duck, sql, name=name)
