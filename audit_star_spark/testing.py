"""Differential-testing harness: run a Spark query and its DuckDB oracle on
the same parquet tables and compare results exactly — a local mirror of the
driver's correctness gate (row count + column set + values)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

from pyspark.sql import DataFrame


def duckdb_connection(sf_dir: str):
    import duckdb

    from audit_star_spark.sources.testdata import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    return v


def _rows(records: list[dict], columns: list[str]) -> list[tuple]:
    out = [tuple(_norm(r[c]) for c in columns) for r in records]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df: DataFrame, con, oracle_sql: str, name: str = "") -> None:
    """Assert the Spark result and the oracle result are identical
    (order-insensitive, column order-insensitive)."""
    import pandas as pd

    sp = spark_df.toPandas()
    du = con.sql(oracle_sql).df()
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    assert sp_cols == du_cols, f"{name}: column sets differ: {sp_cols} vs {du_cols}"
    assert len(sp) == len(du), f"{name}: row counts differ: {len(sp)} vs {len(du)}"
    sp_rows = _rows(sp.where(pd.notnull(sp), None).to_dict("records"), sp_cols)
    du_rows = _rows(du.where(pd.notnull(du), None).to_dict("records"), du_cols)
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(sp_rows, du_rows)) if a != b
    ]
    assert not mism, (
        f"{name}: {len(mism)} row mismatches; first 3:\n"
        + "\n".join(f"  spark={a}\n  duck ={b}" for _, a, b in mism[:3])
    )
