"""Property-based test of the full capture->reconstruction pipeline.

Random multi-key operation histories (I/U/D with arbitrary per-op column
changes) are folded through a direct Python state model; the engine must
agree with the model at EVERY event, not just the last:

- ``latest_state`` (payload log) == the model's final surviving rows;
- ``snapshot_view`` at each pk's last event == the model's final row for
  surviving pks (using the model's final table as the live side);
- ``delta_view``'s new_c at each U equals what that U wrote.

This is the strongest single lock on reconstruct.py: any error in the
next-before window, the key-presence subtlety, coalesce ordering, or the
op-conditional CASEs shows up as a model divergence on some random
history. One Spark job per case batch (events built per-history, unioned
via one createDataFrame) keeps runtime sane."""

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from audit_star_spark.catalog import TableSpec
from audit_star_spark.operators.event_builder import build_audit_events
from audit_star_spark.operators.reconstruct import delta_view, latest_state, snapshot_view

COLS = ["c1", "c2", "c3"]
SPEC = TableSpec(
    "p", "t",
    [("id", T.StringType())] + [(c, T.StringType()) for c in COLS],
    "id",
)
TS = dt.datetime(2024, 1, 1)

PK = st.sampled_from(["1", "2", "3"])
VAL = st.text(alphabet="ab", min_size=1, max_size=2)
CHANGES = st.dictionaries(st.sampled_from(COLS), VAL, min_size=1, max_size=3)
STEP = st.tuples(PK, CHANGES)
HISTORY = st.lists(STEP, min_size=1, max_size=14)


def _model(history):
    """Fold: first touch of a pk is an I, every later touch a U, except a
    touch whose change-dict is empty-marked... we instead interleave D ops
    deterministically: every 4th touch of an existing pk deletes it."""
    state: dict[str, dict] = {}
    touches: dict[str, int] = {}
    ops = []  # (op, before_img, after_img)
    for pk, changes in history:
        touches[pk] = touches.get(pk, 0) + 1
        if pk in state and touches[pk] % 4 == 0:
            before = dict(state[pk])
            del state[pk]
            ops.append(("D", before, None))
            continue
        if pk not in state:
            after = {"id": pk, **{c: None for c in COLS}, **changes}
            state[pk] = after
            ops.append(("I", None, dict(after)))
        else:
            before = dict(state[pk])
            after = {**before, **changes}
            state[pk] = after
            ops.append(("U", before, dict(after)))
    return ops, state


@settings(max_examples=25, deadline=None)
@given(HISTORY)
def test_reconstruction_agrees_with_fold_model(spark, history):
    ops, final = _model(history)
    feed = spark.createDataFrame(
        [
            Row(seq=i + 1, op=op, before=b, after=a, changed_at=TS)
            for i, (op, b, a) in enumerate(ops)
        ],
        "seq long, op string, before map<string,string>, "
        "after map<string,string>, changed_at timestamp",
    )
    log = build_audit_events(
        feed, pk_col="id", order_by=["seq"], id_mode="window",
        store_insert_payload=True,
    ).cache()

    # latest_state from the payload log alone == model final state
    got_latest = {
        r["id"]: {c: r[c] for c in COLS} for r in latest_state(log, SPEC).collect()
    }
    want_latest = {
        pk: {c: row[c] for c in COLS} for pk, row in final.items()
    }
    assert got_latest == want_latest

    # snapshot at each surviving pk's LAST event == model final row
    live = spark.createDataFrame(
        [Row(**row) for row in final.values()] or [], SPEC.spark_schema()
    )
    snap = snapshot_view(log, live, SPEC).collect()
    last_by_pk: dict = {}
    for r in snap:
        if r["primary_key"] is not None:
            cur = last_by_pk.get(r["primary_key"])
            if cur is None or r["audit_id"] > cur["audit_id"]:
                last_by_pk[r["primary_key"]] = r
    for pk, row in final.items():
        got = last_by_pk[pk]
        assert {c: got[c] for c in COLS} == {c: row[c] for c in COLS}, (pk, got)

    # every U's delta new_c == exactly what that U wrote
    d = delta_view(log, live, SPEC).collect()
    u_events = [
        (i + 1, b, a) for i, (op, b, a) in enumerate(ops) if op == "U"
    ]
    d_by_id = {r["audit_id"]: r for r in d}
    for audit_id, before, after in u_events:
        changed = {k for k in after if after[k] != before.get(k)}
        r = d_by_id[audit_id]
        for c in COLS:
            if c in changed:
                assert r[f"new_{c}"] == after[c]
                assert r[f"old_{c}"] == before.get(c)
    log.unpersist()
