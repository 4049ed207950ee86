"""Materialization locks for the suffix ladder's mono-ranks.

``_mono_ranks`` ids come from ``monotonically_increasing_id`` over
range-partitioned keys: equality/order-preserving but RUN-DEPENDENT
(partition boundaries come from the range sampler). That is safe only
because every mono-ranked frame is materialized (localCheckpoint via
``iter_materialize``) before any consumer reads it — two consumers of an
UN-materialized mono-rank plan could recompute different ids and
silently disagree mid-ladder. These tests pin the invariant: every rank
frame the ladder hands out is backed by a checkpointed RDD scan
(LogicalRDD), not a recomputable plan.
"""

from pyspark.sql import functions as F

from audit_star_spark.analytics.suffix import (
    _suffix_rank_history,
    _token_ranks,
)


def _docs(spark):
    rows = [
        (1, "a b c a b c a b"),
        (2, "b c a b c x y z"),
        (3, "z z z z"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _is_checkpoint_backed(df) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "LogicalRDD" in plan


def test_rank_history_frames_are_materialized(spark):
    history = _suffix_rank_history(
        _docs(spark), tokens_expr="split(text, ' ')", mode="distributed"
    )
    assert len(history) >= 2
    for span, frame in history:
        assert _is_checkpoint_backed(frame), (
            f"span-{span} rank frame is a recomputable plan; "
            "mono-rank ids are run-dependent and MUST be materialized "
            "before multi-consumer reads"
        )


def test_token_ranks_frame_is_materialized(spark):
    _toks, cur, _max_len = _token_ranks(
        _docs(spark), "split(text, ' ')", mode="distributed", dense=False
    )
    assert _is_checkpoint_backed(cur)


def test_rank_history_stable_across_consumers(spark):
    """Functional form of the lock: reading the SAME mid-ladder frame
    through two independent consumers yields identical (doc_id, pos, r)
    triples — the run-dependent ids are pinned by the checkpoint."""
    history = _suffix_rank_history(
        _docs(spark), tokens_expr="split(text, ' ')", mode="distributed"
    )
    span, frame = history[min(1, len(history) - 1)]
    a = {(r["doc_id"], r["pos"]): r["r"] for r in frame.collect()}
    agg = frame.groupBy("r").agg(F.count("*").alias("c"))
    b = dict(
        frame.join(agg, "r")
        .select("doc_id", "pos", "r")
        .rdd.map(lambda r: ((r["doc_id"], r["pos"]), r["r"]))
        .collect()
    )
    assert a == b
