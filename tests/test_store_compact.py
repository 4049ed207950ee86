"""Crash-atomic, replay-safe store compaction (store_compact.py).

Two invariants, each injected-failure tested:

1. Atomicity: a crash at ANY point of the compact swap leaves the store
   readable with pre- or post-compaction contents — never neither, never
   a mix.
2. Replay safety: a micro-batch whose partition was folded into the
   baseline and which is then REPLAYED (data landed, streaming commit
   lost) must not double its rows in any read path.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from audit_star_spark.streaming import store_compact as sc
from audit_star_spark.streaming.store_compact import (
    atomic_swap,
    compacted_through,
    recover_store,
)


# ---------------------------------------------------------------- swap core


def _mkstore(path, tag):
    os.makedirs(path)
    with open(os.path.join(path, "data.txt"), "w") as f:
        f.write(tag)


def _content(path):
    with open(os.path.join(path, "data.txt")) as f:
        return f.read()


def _write_tmp(tag):
    def write(tmp):
        _mkstore(tmp, tag)

    return write


def test_swap_completes(tmp_path):
    store = str(tmp_path / "s")
    _mkstore(store, "old")
    atomic_swap(store, _write_tmp("new"), 7)
    assert _content(store) == "new"
    assert compacted_through(store) == 7
    assert not os.path.exists(store + ".compact-tmp")
    assert not os.path.exists(store + ".compact-old")


def test_crash_during_tmp_write_keeps_old(tmp_path):
    store = str(tmp_path / "s")
    _mkstore(store, "old")

    def bad_write(tmp):
        _mkstore(tmp, "half")  # no meta marker ever written
        raise RuntimeError("injected crash mid-write")

    with pytest.raises(RuntimeError):
        atomic_swap(store, bad_write, 7)
    recover_store(store)
    assert _content(store) == "old"
    assert compacted_through(store) == -1
    # the incomplete tmp is inert junk (no marker) — recover_store must
    # NOT sweep it while the live store exists (it cannot tell junk from
    # an in-progress compact's half-written tmp); the next swap does
    assert os.path.exists(store + ".compact-tmp")
    atomic_swap(store, _write_tmp("new"), 7)
    assert _content(store) == "new"
    assert not os.path.exists(store + ".compact-tmp")


@pytest.mark.parametrize("fail_at,expect", [(1, "old"), (2, "new")])
def test_crash_at_each_rename(tmp_path, monkeypatch, fail_at, expect):
    """Failure at rename 1 (store->old did not happen): store intact,
    recovery keeps PRE contents. Failure at rename 2 (store moved away,
    tmp complete with marker): recovery rolls FORWARD to POST."""
    store = str(tmp_path / "s")
    _mkstore(store, "old")
    calls = {"n": 0}
    real = os.rename

    def failing(a, b):
        calls["n"] += 1
        if calls["n"] == fail_at:
            raise RuntimeError("injected crash at rename")
        return real(a, b)

    monkeypatch.setattr(sc.os, "rename", failing)
    with pytest.raises(RuntimeError):
        atomic_swap(store, _write_tmp("new"), 7)
    monkeypatch.setattr(sc.os, "rename", real)
    recover_store(store)
    assert _content(store) == expect
    # post-compaction recovery must surface the meta too
    assert compacted_through(store) == (7 if expect == "new" else -1)
    assert not os.path.exists(store + ".compact-old")
    if expect == "old":
        # store intact -> recover leaves the tmp alone (could be an
        # in-progress compact); the retry sweeps and completes it
        atomic_swap(store, _write_tmp("new"), 7)
        assert _content(store) == "new"
    assert not os.path.exists(store + ".compact-tmp")


def test_crash_before_old_cleanup_keeps_new(tmp_path, monkeypatch):
    """Crash between the final rename and deleting .compact-old: store
    already holds the new contents; recovery just sweeps the leftovers."""
    store = str(tmp_path / "s")
    _mkstore(store, "old")
    real = sc.shutil.rmtree
    state = {"armed": False}

    def failing(path, **kw):
        # only the final hard cleanup (no ignore_errors) is the crash
        # point; recover's best-effort sweeps must pass through
        if (
            state["armed"]
            and path.endswith(".compact-old")
            and not kw.get("ignore_errors")
        ):
            raise RuntimeError("injected crash at cleanup")
        return real(path, **kw)

    monkeypatch.setattr(sc.shutil, "rmtree", failing)
    state["armed"] = True
    with pytest.raises(RuntimeError):
        atomic_swap(store, _write_tmp("new"), 7)
    state["armed"] = False
    recover_store(store)
    assert _content(store) == "new"
    assert compacted_through(store) == 7
    assert not os.path.exists(store + ".compact-old")


def test_incomplete_tmp_without_store_rolls_back(tmp_path):
    """Old renamed away, tmp has NO marker (should be impossible under
    the protocol order, but recovery must still pick a side): roll back."""
    store = str(tmp_path / "s")
    _mkstore(store + ".compact-old", "old")
    _mkstore(store + ".compact-tmp", "half")
    recover_store(store)
    assert _content(store) == "old"
    assert not os.path.exists(store + ".compact-tmp")


# ------------------------------------------------- SCD2 store end-to-end


@pytest.fixture()
def users_log(spark):
    from audit_star_spark.plans.logstore import cached_users_log
    from tests.conftest import SF_DIR

    log, _, spec = cached_users_log(spark, SF_DIR, payload=True)
    return log, spec


def _scd_rows(store, spark):
    return sorted(map(tuple, store.read(spark).collect()))


def test_scd2_compact_is_crash_atomic(spark, tmp_path, users_log, monkeypatch):
    from audit_star_spark.streaming.scd import StreamingSCD2

    log, spec = users_log
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    store.apply_batch(log.filter(F.col("audit_id") % 2 == 0), 0)
    store.apply_batch(log.filter(F.col("audit_id") % 2 == 1), 1)
    want = _scd_rows(store, spark)

    real = os.rename
    for fail_at in (1, 2):
        calls = {"n": 0}

        def failing(a, b, _fail_at=fail_at, _calls=calls):
            _calls["n"] += 1
            if _calls["n"] == _fail_at:
                raise RuntimeError("injected crash")
            return real(a, b)

        monkeypatch.setattr(sc.os, "rename", failing)
        with pytest.raises(RuntimeError):
            store.compact(spark)
        monkeypatch.setattr(sc.os, "rename", real)
        # read() self-recovers and sees pre- or post-compaction contents;
        # both derive the same logical table
        assert _scd_rows(store, spark) == want
    # a clean compact still completes afterwards
    store.compact(spark)
    assert _scd_rows(store, spark) == want
    parts = {p for p in os.listdir(store.store_path) if p.startswith("ingest_")}
    assert parts == {"ingest_batch_id=-1"}


def test_scd2_replay_after_compaction_no_duplicate_audit_ids(
    spark, tmp_path, users_log
):
    """The round-6 ADVICE scenario: batch 1 written, checkpoint commit
    lost, compact() folds it, then the restarted query replays batch 1.
    Its partition re-appears next to the baseline copy — read() must
    still see every audit_id exactly once and derive the batch result."""
    from audit_star_spark.operators.scd import scd2_history
    from audit_star_spark.streaming.scd import StreamingSCD2

    log, spec = users_log
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    b1 = log.filter(F.col("audit_id") % 2 == 1)
    store.apply_batch(log.filter(F.col("audit_id") % 2 == 0), 0)
    store.apply_batch(b1, 1)
    store.compact(spark)
    store.apply_batch(b1, 1)  # replay of a FOLDED batch
    got = store.read(spark)
    ids = got.groupBy("version_audit_id").count().filter("count > 1")
    assert ids.count() == 0
    want = scd2_history(log, None, spec)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # and a further compact folds the replayed partition away again
    # (re-plan after the swap: `got` captured the old file listing)
    store.compact(spark)
    again = store.read(spark)
    assert again.count() == want.count()
    assert again.exceptAll(want).count() == 0


def test_scd2_read_dedups_out_of_contract_duplicates(spark, tmp_path, users_log):
    """Belt-and-braces: a store whose baseline ALREADY contains a batch's
    rows twice (hand-merged dirs, no meta) must read each audit_id once,
    keeping the max-ingest_batch_id copy."""
    from audit_star_spark.streaming.scd import StreamingSCD2

    log, spec = users_log
    store = StreamingSCD2(str(tmp_path / "scd"), spec)
    store.apply_batch(log, 0)
    want = _scd_rows(store, spark)
    # duplicate every event under a second live partition, no meta file
    ev = spark.read.parquet(store.store_path).filter("ingest_batch_id = 0")
    (
        ev.withColumn("ingest_batch_id", F.lit(1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch_id")
        .parquet(store.store_path)
    )
    assert _scd_rows(store, spark) == want


# ---------------------------------------------- rollup + neardup replay


def test_rollup_replay_after_compaction_not_double_counted(spark, tmp_path):
    from audit_star_spark.streaming.rollup import EventRollup
    from tests.conftest import SF_DIR

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    roll = EventRollup(str(tmp_path / "roll"))
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    roll.apply_batch(b0, 0)
    roll.apply_batch(b1, 1)
    want = sorted(map(tuple, roll.read(spark).collect()))
    roll.compact(spark)
    roll.apply_batch(b1, 1)  # replay of a folded batch
    assert sorted(map(tuple, roll.read(spark).collect())) == want
    # post-compaction NEW batches still merge (ids beyond compacted_through)
    roll.compact(spark)
    assert compacted_through(roll.store_path) == 1
    more = events.filter(F.col("event_id") % 7 == 3)
    roll.apply_batch(more, 2)
    merged = roll.read(spark)
    n = merged.agg(F.sum("n_events")).collect()[0][0]
    assert n == events.count() + more.count()


def test_rollup_compact_is_crash_atomic(spark, tmp_path, monkeypatch):
    from audit_star_spark.streaming.rollup import EventRollup
    from tests.conftest import SF_DIR

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    roll = EventRollup(str(tmp_path / "roll"))
    roll.apply_batch(events, 0)
    want = sorted(map(tuple, roll.read(spark).collect()))
    real = os.rename
    calls = {"n": 0}

    def failing(a, b):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash")
        return real(a, b)

    monkeypatch.setattr(sc.os, "rename", failing)
    with pytest.raises(RuntimeError):
        roll.compact(spark)
    monkeypatch.setattr(sc.os, "rename", real)
    assert sorted(map(tuple, roll.read(spark).collect())) == want


def test_neardup_replay_after_compaction_no_signature_double(spark, tmp_path):
    """Replaying a folded batch must not double its signatures in the
    store read nor change the emitted pairs."""
    from audit_star_spark.streaming.dedup import StreamingNearDup
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    nd = StreamingNearDup(
        str(tmp_path / "store"), str(tmp_path / "pairs"), threshold=0.5
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    nd.process_batch(b0, 0)
    nd.process_batch(b1, 1)
    pairs_before = sorted(
        map(tuple, nd.pairs(spark).select("doc_a", "doc_b").collect())
    )
    nd.compact(spark)
    nd.process_batch(b1, 1)  # replay of a folded batch
    store = nd._store(spark)
    dup = store.groupBy("doc_id").count().filter("count > 1")
    assert dup.count() == 0
    pairs_after = sorted(
        map(tuple, nd.pairs(spark).select("doc_a", "doc_b").collect())
    )
    assert pairs_after == pairs_before


def test_meta_file_ignored_by_parquet_reader(tmp_path, spark):
    """The `_`-prefixed meta file must be invisible to spark.read."""
    p = str(tmp_path / "t")
    spark.range(5).withColumn("ingest_batch_id", F.lit(-1)).write.partitionBy(
        "ingest_batch_id"
    ).parquet(p)
    with open(os.path.join(p, "_compaction_meta.json"), "w") as f:
        json.dump({"compacted_through": 3}, f)
    assert spark.read.parquet(p).count() == 5
    assert compacted_through(p) == 3


def test_recover_during_compact_write_phase_is_safe(tmp_path):
    """A read path calling recover_store while a compaction is mid-write
    (live store present, tmp half-written) must leave the compactor's
    tmp dir alone — the old behavior rmtree'd it out from under the
    compaction, failing it."""
    store = str(tmp_path / "s")
    _mkstore(store, "old")

    seen = {}

    def write_with_concurrent_reader(tmp):
        _mkstore(tmp, "new")
        # a reader races the write phase
        recover_store(store)
        seen["tmp_survived"] = os.path.isdir(tmp)

    atomic_swap(store, write_with_concurrent_reader, 3)
    assert seen["tmp_survived"]
    assert _content(store) == "new"
    assert compacted_through(store) == 3


# ---------------------------------------------------- checkpoint lineage


def _fake_checkpoint(path, qid):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "metadata"), "w") as f:
        json.dump({"id": qid}, f)


def test_verify_lineage_refuses_fresh_checkpoint_on_compacted_store(tmp_path):
    """visible() assumes batch ids at/below compacted_through only recur
    as replays of folded batches. A fresh/reset checkpoint restarts ids
    at 0 -> every new batch would be silently pruned. verify_lineage
    must refuse instead of losing data silently."""
    from audit_star_spark.streaming.store_compact import (
        bind_lineage,
        verify_lineage,
    )

    store = str(tmp_path / "s")
    _mkstore(store, "x")
    bind_lineage(store, "qid-original")
    with open(os.path.join(store, "_compaction_meta.json"), "w") as f:
        json.dump({"compacted_through": 4}, f)

    ok = str(tmp_path / "ckpt_ok")
    _fake_checkpoint(ok, "qid-original")
    verify_lineage(store, ok)  # same lineage: fine

    fresh = str(tmp_path / "ckpt_fresh")  # no metadata yet
    with pytest.raises(RuntimeError, match="silently pruned"):
        verify_lineage(store, fresh)

    foreign = str(tmp_path / "ckpt_foreign")
    _fake_checkpoint(foreign, "qid-other")
    with pytest.raises(RuntimeError, match="silently pruned"):
        verify_lineage(store, foreign)

    # explicit unbind is the documented override
    os.remove(os.path.join(store, "_query_lineage.json"))
    verify_lineage(store, foreign)


def test_verify_lineage_rebinds_uncompacted_store_with_warning(tmp_path):
    from audit_star_spark.streaming.store_compact import (
        bind_lineage,
        bound_query_id,
        verify_lineage,
    )

    store = str(tmp_path / "s")
    _mkstore(store, "x")
    bind_lineage(store, "qid-a")
    foreign = str(tmp_path / "ckpt")
    _fake_checkpoint(foreign, "qid-b")
    with pytest.warns(UserWarning, match="re-bound"):
        verify_lineage(store, foreign)  # uncompacted: allowed
    bind_lineage(store, "qid-b")
    assert bound_query_id(store) == "qid-b"


def test_lineage_survives_compaction_swap(tmp_path):
    from audit_star_spark.streaming.store_compact import (
        bind_lineage,
        bound_query_id,
    )

    store = str(tmp_path / "s")
    _mkstore(store, "old")
    bind_lineage(store, "qid-1")
    atomic_swap(store, _write_tmp("new"), 5)
    assert bound_query_id(store) == "qid-1"
    assert compacted_through(store) == 5


def test_scd2_ingest_binds_and_enforces_lineage(spark, tmp_path, users_log):
    """End-to-end: ingest -> compact -> restart from the SAME checkpoint
    works; restart from a FRESH checkpoint is refused."""
    from audit_star_spark.streaming.scd import StreamingSCD2
    from audit_star_spark.streaming.store_compact import bound_query_id

    store = str(tmp_path / "scd_store")
    log, spec = users_log
    log_dir = str(tmp_path / "log")
    log.select(
        "audit_id",
        "primary_key",
        "changed_at",
        "operation",
        "change",
        "before_change",
    ).write.parquet(log_dir)
    src = spark.readStream.schema(
        spark.read.parquet(log_dir).schema
    ).parquet(log_dir)
    scd = StreamingSCD2(store, spec)
    ck1 = str(tmp_path / "ck1")
    q = scd.ingest(src, ck1)
    q.awaitTermination()
    assert bound_query_id(store) is not None
    scd.compact(spark)
    # same checkpoint: restart passes verify and is a no-op drain
    scd.ingest(src, ck1).awaitTermination()
    n = scd.read(spark).count()
    assert n > 0
    # fresh checkpoint: refused before any batch can be pruned
    with pytest.raises(RuntimeError, match="silently pruned"):
        scd.ingest(src, str(tmp_path / "ck2"))
    assert scd.read(spark).count() == n


def test_neardup_compact_folds_newest_copy_per_doc(spark, tmp_path):
    """Out-of-contract shape: the same doc_id ingested in two batches
    (old copy in one partition, fresh copy in another). compact() must
    keep only the max-ingest_batch_id copy in the -1 baseline — folding
    both verbatim made every later batch fan out duplicate pair rows."""
    from audit_star_spark.streaming.dedup import StreamingNearDup
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    nd = StreamingNearDup(
        str(tmp_path / "store"), str(tmp_path / "pairs"), threshold=0.5
    )
    b0 = docs.filter(F.col("doc_id") < 40)
    # batch 1 re-ingests docs 20..39 (out of contract) plus fresh ones
    b1 = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 80))
    nd.process_batch(b0, 0)
    raw = spark.read.parquet(str(tmp_path / "store"))
    # simulate the hazard: batch 1's overlap lands WITHOUT the anti-join
    # protection having pruned batch 0's copies (they are in partition 0)
    nd.process_batch(b1, 1)
    per_doc = (
        spark.read.parquet(str(tmp_path / "store"))
        .groupBy("doc_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert per_doc > 0  # the duplicate shape exists pre-compaction
    nd.compact(spark)
    store = nd._store(spark)
    assert store.groupBy("doc_id").count().filter("count > 1").count() == 0
    # the kept copy is batch 1's (newest): spot-check one overlapped doc
    assert store.filter(F.col("doc_id") == 25).count() == 1
