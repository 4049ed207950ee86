"""JSON CDC connector: Debezium-shaped envelopes -> canonical feed ->
audit log, batch and streaming."""

import json

from audit_star_spark.operators.event_builder import build_audit_events
from audit_star_spark.sources.cdc import change_feed_from_json

EVENTS = [
    {
        "event_id": 1,
        "op": "c",
        "ts_ms": 1_700_000_000_000,
        "before": None,
        "after": json.dumps({"id": "1", "name": "ada"}),
        "source": {"changed_by": "svc", "db_user": "app", "client_addr": "10.0.0.1", "client_port": 5432},
    },
    {
        "event_id": 2,
        "op": "u",
        "ts_ms": 1_700_000_001_000,
        "before": json.dumps({"id": "1", "name": "ada"}),
        "after": json.dumps({"id": "1", "name": "grace"}),
        "source": {"changed_by": "svc", "db_user": "app", "client_addr": "10.0.0.1", "client_port": 5432},
    },
    {
        "event_id": 3,
        "op": "d",
        "ts_ms": 1_700_000_002_000,
        "before": json.dumps({"id": "1", "name": "grace"}),
        "after": None,
        "source": {"changed_by": "svc", "db_user": "app", "client_addr": "10.0.0.1", "client_port": 5432},
    },
]


def _write_jsonl(tmp_path):
    p = tmp_path / "cdc"
    p.mkdir()
    (p / "part-0.json").write_text("\n".join(json.dumps(e) for e in EVENTS))
    return str(p)


def test_json_envelope_parses_and_builds_log(spark, tmp_path):
    feed = change_feed_from_json(spark, _write_jsonl(tmp_path))
    log = build_audit_events(feed, pk_col="id", order_by=["event_id"])
    rows = {r["audit_id"]: r for r in log.collect()}
    assert [rows[i]["operation"] for i in (1, 2, 3)] == ["I", "U", "D"]
    # UPDATE stores only the changed column, both directions
    assert rows[2]["before_change"] == {"name": "ada"}
    assert rows[2]["change"] == {"name": "grace"}
    # DELETE stores the full old row, change NULL
    assert rows[3]["before_change"] == {"id": "1", "name": "grace"}
    assert rows[3]["change"] is None
    assert rows[1]["primary_key"] == "1"
    assert rows[1]["db_user"] == "app"
    assert str(rows[1]["changed_at"]) == "2023-11-14 22:13:20"


def test_json_feed_streams(spark, tmp_path):
    src = _write_jsonl(tmp_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = change_feed_from_json(spark, src, streaming=True)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["op"] for r in got.collect()} == {"I", "U", "D"}
