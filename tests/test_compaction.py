"""Log compaction: fold per-micro-batch directories into one sorted
segment without changing a single row, and keep ingest appendable after."""

import datetime as dt
import glob
import os

from pyspark.sql import Row

from audit_star_spark.plans.logstore import compact_log
from audit_star_spark.sources.cdc import users_change_feed
from audit_star_spark.sources.testdata import load_table
from audit_star_spark.streaming.ingest import FEED_SCHEMA, AuditIngest
from tests.conftest import SF_DIR


def test_compaction_preserves_rows_and_allows_further_ingest(spark, tmp_path):
    feed_path = str(tmp_path / "feed")
    feed = users_change_feed(load_table(spark, SF_DIR, "events"))
    feed.select(*[f.name for f in FEED_SCHEMA.fields]).repartition(4).write.parquet(
        feed_path
    )
    ingest = AuditIngest(
        spark,
        source_dir=feed_path,
        log_dir=str(tmp_path / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        pk_col="id",
        max_files_per_trigger=1,
    )
    ingest.start(available_now=True).awaitTermination()

    log_dir = str(tmp_path / "log")
    def rows(df):
        import json

        return [
            json.dumps(r.asDict(), sort_keys=True, default=str)
            for r in df.orderBy("audit_id").collect()
        ]

    before = rows(ingest.log())
    files_before = len(glob.glob(os.path.join(log_dir, "__batch=*", "*.parquet")))

    n = compact_log(spark, log_dir, target_files=2)
    assert n == len(before) == 1000

    after = rows(ingest.log())
    assert after == before
    dirs = [e for e in os.listdir(log_dir) if e.startswith("__batch=")]
    assert dirs == ["__batch=-1"]
    files_after = len(glob.glob(os.path.join(log_dir, "__batch=-1", "*.parquet")))
    assert files_after < files_before

    # ingest keeps appending after compaction with continuing ids
    extra = [
        Row(
            event_id=10_001,
            op="U",
            before={"id": "1", "etype": "click", "k": "1", "val": "1.00"},
            after={"id": "1", "etype": "click", "k": "2", "val": "2.00"},
            changed_at=dt.datetime(2024, 2, 1),
            changed_by="svc",
            db_user="app",
            client_addr=None,
            client_port=None,
        )
    ]
    spark.createDataFrame(extra, FEED_SCHEMA).coalesce(1).write.mode("append").parquet(
        feed_path
    )
    ingest.start(available_now=True).awaitTermination()
    log = ingest.log()
    assert log.count() == 1001
    ids = [r["audit_id"] for r in log.orderBy("audit_id").collect()]
    assert ids == list(range(1, 1002))
