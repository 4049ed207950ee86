"""Streaming deduplication of a change/event feed.

The reference's capture path cannot see duplicates — the PG trigger fires
exactly once per row change inside the user's transaction
(audit.go:872–926). A distributed ingest feed has no such guarantee
(at-least-once delivery, replayed micro-batches), so the Spark-native
engine needs an explicit exactly-once gate in front of the audit-event
builder.

Two operators, both built on Spark's stateful streaming dedup:

- :func:`dedup_stream` — ``dropDuplicatesWithinWatermark``: state for a
  key is kept only while it can still collide under the event-time
  watermark, so state size is bounded by (arrival rate x watermark), not
  by the key cardinality of the whole history. This is the 100 TB-safe
  default.
- :func:`dedup_stream_exact` — ``dropDuplicates``: unbounded state,
  exact across the entire stream lifetime. Only for low-cardinality keys
  (e.g. per-table provisioning control events).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Drop re-delivered events whose duplicates arrive within the
    watermark horizon. Rows older than the watermark are dropped by the
    watermark itself, so every event is emitted at most once."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def dedup_stream_exact(events: DataFrame, keys: Sequence[str] = ("event_id",)) -> DataFrame:
    """Exact streaming dedup with unbounded per-key state."""
    return events.dropDuplicates(list(keys))
