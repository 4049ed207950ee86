"""Streaming sessionization over an events feed — the stateful-streaming
surface of the analytics layer.

Two tiers, per the engine's "built-ins first" rule:

- :func:`session_window_agg` — Spark's native ``session_window`` gap
  sessionization (watermark-driven state cleanup, JVM-side, codegen). Use
  this whenever "split at inactivity gap" is the whole requirement.
- :func:`capped_sessions` — a custom stateful operator via
  ``applyInPandasWithState`` for semantics ``session_window`` cannot
  express: a session closes at an inactivity gap OR as soon as its
  accumulated value exceeds a cap (budget-bounded sessions). State is one
  small tuple per user; rows are Arrow-batched per key.

Scale notes: both shapes shuffle once on the grouping key and keep state
partitioned by that key across micro-batches — the standard keyed-state
layout that survives a 1000-executor cluster. Watermark/event-time
timeouts bound state size; no state ever scans another key.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 3600

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

# (session_start_us, session_end_us, n_events, session_value)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def session_window_agg(
    events: DataFrame, gap: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Native gap sessionization: one closed-session row per (user,
    session) once the watermark passes the gap. ``events`` needs
    ``user_id``, ``ts``, ``value`` columns."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def _us(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def _emit(user_id: int, s: tuple[int, int, int, float]) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(s[0] * 1_000),
        "session_end": pd.Timestamp(s[1] * 1_000),
        "n_events": s[2],
        "session_value": s[3],
    }


def _session_fn(
    key: tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState, value_cap: float
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[dict[str, Any]] = []

    if state.hasTimedOut:
        if state.exists:
            closed.append(_emit(user_id, tuple(state.get)))
            state.remove()
        yield pd.DataFrame(closed)
        return

    cur: tuple[int, int, int, float] | None = (
        tuple(state.get) if state.exists else None
    )
    rows = pd.concat(list(pdfs)).sort_values("ts")
    # bulk datetime64->int64 conversion; per-element pd.Timestamp in the
    # loop is ~10x the cost of the session logic itself
    ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    for t, value in zip(ts_us.tolist(), rows["value"].tolist()):
        v = float(value)
        if cur is not None and t - cur[1] > GAP_SECONDS * 1_000_000:
            closed.append(_emit(user_id, cur))
            cur = None
        if cur is None:
            cur = (t, t, 1, v)
        else:
            cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
        # the cap is the non-session_window part: close eagerly the moment
        # the budget is spent, regardless of gaps
        if cur[3] >= value_cap:
            closed.append(_emit(user_id, cur))
            cur = None

    if cur is not None:
        state.update(cur)
        # event-time timeout: fires when the watermark passes end + gap
        state.setTimeoutTimestamp(cur[1] // 1_000 + GAP_SECONDS * 1_000)
    elif state.exists:
        state.remove()
    yield pd.DataFrame(closed)


def _split_sessions(
    user_id: int, pdf: pd.DataFrame, value_cap: float
) -> list[dict[str, Any]]:
    """Pure sessionizer shared by the batch and streaming operators: split
    at a >GAP_SECONDS gap or when accumulated value reaches the cap."""
    out: list[dict[str, Any]] = []
    cur: tuple[int, int, int, float] | None = None
    ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    for t, value in zip(ts_us.tolist(), pdf["value"].tolist()):
        v = float(value)
        if cur is not None and t - cur[1] > GAP_SECONDS * 1_000_000:
            out.append(_emit(user_id, cur))
            cur = None
        if cur is None:
            cur = (t, t, 1, v)
        else:
            cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
        if cur[3] >= value_cap:
            out.append(_emit(user_id, cur))
            cur = None
    if cur is not None:
        out.append(_emit(user_id, cur))
    return out


def capped_sessions_batch(events: DataFrame, value_cap: float = 500.0) -> DataFrame:
    """Batch twin of :func:`capped_sessions`: same split semantics over a
    static events table. The inherently sequential per-user
    accumulate-and-reset cannot be a window expression.

    Physical shape: repartition by user + sort within partitions, then ONE
    ``mapInPandas`` invocation per partition with an in-process pandas
    groupby — not per-user ``applyInPandas``, whose ~ms of Arrow/worker
    overhead per group dominates when groups are small and numerous
    (measured ~10x slower with 1500 users at sf0.1). Cost: each partition
    is concatenated in the Python worker, so partitions must fit worker
    memory — the repartition key spreads users across all partitions."""

    cols = [f.name for f in SESSION_SCHEMA.fields]

    def fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(pdfs)
        if not chunks:
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        rows: list[dict[str, Any]] = []
        for uid, g in pdf.groupby("user_id", sort=False):
            rows.extend(_split_sessions(uid, g, value_cap))
        yield pd.DataFrame(rows, columns=cols)

    df = events.select("user_id", "ts", F.col("value").cast("double"))
    # explicit partition count: AQE would coalesce a small keyed shuffle
    # to one partition, serializing every user onto a single Python
    # worker — the pandas stage parallelism IS the point here
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(n, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .mapInPandas(fn, SESSION_SCHEMA)
    )


def capped_sessions(
    events: DataFrame, value_cap: float = 500.0, watermark: str = "1 hour"
) -> DataFrame:
    """Custom stateful sessionization: sessions split at a >1h gap OR when
    accumulated ``value`` reaches ``value_cap`` (whichever first). Emits
    closed sessions only (append mode); open sessions live in keyed state
    until their event-time timeout."""

    def fn(key, pdfs, state):
        yield from _session_fn(key, pdfs, state, value_cap)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
