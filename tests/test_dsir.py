"""DSIR importance resampling (analytics/dsir.py): planted-shift
calibration (target-like candidates must outscore and outnumber the
rest in the selection), a pure-Python replication of the log-weight
formula at 1e-9, bit_exact parity, and the scale-shape plan lock
(ratio table broadcasts; selection is TakeOrderedAndProject, no global
sort)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from audit_star_spark.analytics.dsir import (
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_counts,
)


def _mkdocs(spark):
    """60 docs: 20 target (source='tgt') rich in 'zebra quagga', 20
    candidates with the same profile, 20 candidates of unrelated
    tokens. Text varies per doc so hashing sees distinct bigrams."""
    rows = []
    for i in range(20):
        rows.append((i, "zebra quagga stripe zebra quagga herd%d" % i, "tgt"))
    for i in range(20, 40):
        rows.append((i, "zebra quagga stripe zebra quagga herd%d" % i, "raw"))
    for i in range(40, 60):
        rows.append((i, "rocket engine thrust nozzle fuel stage%d" % i, "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_planted_shift_calibration(spark):
    docs = _mkdocs(spark)
    lw = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(docs, "source = 'tgt'", n_buckets=64).collect()
    }
    assert set(lw) == set(range(20, 60))  # candidates only
    zebra = [lw[i] for i in range(20, 40)]
    rocket = [lw[i] for i in range(40, 60)]
    # every target-like candidate outscores every unrelated one
    assert min(zebra) > max(rocket)
    sel = dsir_resample(docs, "source = 'tgt'", k=15, n_buckets=64)
    picked = [r["doc_id"] for r in sel.collect()]
    assert len(picked) == 15
    n_zebra = sum(1 for d in picked if 20 <= d < 40)
    # importance resampling must overselect the target-like half
    # (uniform would give ~7.5; the weight gap makes this deterministic)
    assert n_zebra >= 12


def _py_bucket(tok: str, b: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % b


def _py_log_weights(rows, target_pred, b):
    """Pure-Python DSIR replication: same hashing, same add-one
    smoothing, same SORTED fold."""
    counts = {}
    for doc_id, text, source in rows:
        toks = text.strip().lower().split()
        grams = list(toks) + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]
        d = counts.setdefault(doc_id, {})
        for g in grams:
            k = _py_bucket(g, b)
            d[k] = d.get(k, 0) + 1
    tgt = {doc_id for doc_id, _t, source in rows if target_pred(source)}
    tc, qc = {}, {}
    for doc_id, d in counts.items():
        dst = tc if doc_id in tgt else qc
        for k, c in d.items():
            dst[k] = dst.get(k, 0) + c
    tt, qt = sum(tc.values()), sum(qc.values())
    lr = {
        k: math.log((tc.get(k, 0) + 1.0) / (tt + b))
        - math.log((qc.get(k, 0) + 1.0) / (qt + b))
        for k in range(b)
    }
    out = {}
    for doc_id, d in counts.items():
        if doc_id in tgt:
            continue
        out[doc_id] = math.fsum(sorted(c * lr[k] for k, c in d.items()))
    return out


def test_log_weights_match_python_reference(spark):
    docs = _mkdocs(spark)
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(docs, "source = 'tgt'", n_buckets=64).collect()
    }
    rows = [(r["doc_id"], r["text"], r["source"]) for r in docs.collect()]
    want = _py_log_weights(rows, lambda s: s == "tgt", 64)
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-12)


def test_bit_exact_parity(spark):
    docs = _mkdocs(spark)
    g = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(
            docs, "source = 'tgt'", n_buckets=64, bit_exact=True
        ).collect()
    }
    p = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(
            docs, "source = 'tgt'", n_buckets=64, bit_exact=False
        ).collect()
    }
    assert set(g) == set(p)
    for k in g:
        assert g[k] == pytest.approx(p[k], rel=1e-9, abs=1e-12)


def test_counts_are_exact_integers(spark):
    docs = spark.createDataFrame(
        [(1, "a b a", "s")], "doc_id long, text string, source string"
    )
    rows = hashed_ngram_counts(docs, n_buckets=8).collect()
    # 3 unigrams (a x2, b) + 2 bigrams ("a b", "b a") = 5 grams total
    assert sum(r["c"] for r in rows) == 5


def test_single_token_doc_has_no_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "solo", "s")], "doc_id long, text string, source string"
    )
    rows = hashed_ngram_counts(docs, n_buckets=8).collect()
    assert sum(r["c"] for r in rows) == 1


def test_selection_plan_shape(spark):
    """Scale locks: the per-bucket ratio join broadcasts (no shuffle of
    the corpus against a 256-row table) and the top-k compiles to
    TakeOrderedAndProject, never a global Sort+Limit of all candidates."""
    docs = _mkdocs(spark)
    sel = dsir_resample(docs, "source = 'tgt'", k=5, n_buckets=64)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_validation_errors(spark):
    docs = _mkdocs(spark)
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_resample(docs, "source = 'tgt'", k=0)
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_ngram_counts(docs, n_buckets=1)
