"""UniMax budget allocation: the windowed closed form must equal the
paper's sequential greedy on every branch (capped prefix, all-capped,
none-capped, empty source)."""

import pytest


def _greedy(tokens: dict[str, int], budget: int, max_epochs: float):
    """Direct transcription of the UniMax greedy (ascending by cap):
    alloc_i = min(cap_i, remaining / remaining_count)."""
    caps = {s: round(n * max_epochs) for s, n in tokens.items()}
    order = sorted(tokens, key=lambda s: (caps[s], s))
    remaining, left = float(budget), len(order)
    out = {}
    for s in order:
        fair = remaining / left
        out[s] = min(float(caps[s]), fair)
        remaining -= out[s]
        left -= 1
    return caps, out


def _docs(spark, tokens: dict[str, int]):
    rows = [
        (i, s, " ".join(f"w{j}" for j in range(n)) if n else "")
        for i, (s, n) in enumerate(tokens.items())
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _check(spark, tokens, budget, max_epochs):
    from audit_star_spark.analytics.text import unimax_budget

    caps, want = _greedy(tokens, budget, max_epochs)
    got = {
        r["source"]: r
        for r in unimax_budget(
            _docs(spark, tokens), budget, max_epochs
        ).collect()
    }
    assert set(got) == set(tokens)
    for s, r in got.items():
        assert r["cap"] == caps[s]
        assert r["alloc6"] == pytest.approx(want[s], abs=1e-6)
        assert r["capped"] == (want[s] == caps[s] and want[s] < budget / 1)
    return got


def test_unimax_mixed_capped_prefix(spark):
    # small sources hit their epoch cap; the rest split the remainder
    tokens = {"tiny": 10, "small": 40, "mid": 200, "big": 1000}
    got = _check(spark, tokens, budget=600, max_epochs=2.0)
    assert got["tiny"]["capped"] and got["small"]["capped"]
    assert not got["big"]["capped"]
    # equal-share tail: mid and big get the same allocation
    assert got["mid"]["alloc6"] == got["big"]["alloc6"] == 250.0
    assert got["tiny"]["epochs6"] == 2.0  # capped source runs full epochs


def test_unimax_none_capped_is_uniform(spark):
    tokens = {"a": 500, "b": 600, "c": 700}
    got = _check(spark, tokens, budget=900, max_epochs=1.0)
    assert not any(r["capped"] for r in got.values())
    assert {r["alloc6"] for r in got.values()} == {300.0}


def test_unimax_all_capped_when_budget_exceeds_caps(spark):
    tokens = {"a": 100, "b": 200}
    got = _check(spark, tokens, budget=10_000, max_epochs=1.5)
    assert all(r["capped"] for r in got.values())
    assert got["a"]["alloc6"] == 150.0 and got["b"]["alloc6"] == 300.0


def test_unimax_empty_source_and_validation(spark):
    from audit_star_spark.analytics.text import unimax_budget

    tokens = {"empty": 0, "a": 300, "b": 500}
    got = {
        r["source"]: r
        for r in unimax_budget(_docs(spark, tokens), 400, 1.0).collect()
    }
    # the whitespace tokenizer maps empty text to ONE empty token (the
    # D_TOKENS parity convention), so a 1-token source caps at 1
    assert got["empty"]["n_tokens"] == 1
    assert got["empty"]["alloc6"] == 1.0 and got["empty"]["capped"]
    with pytest.raises(ValueError):
        unimax_budget(_docs(spark, tokens), 0, 1.0)
    with pytest.raises(ValueError):
        unimax_budget(_docs(spark, tokens), 100, 0.0)


def test_unimax_matches_greedy_on_many_shapes(spark):
    # sweep budgets across the full range so the capped-prefix length
    # takes every value 0..n
    tokens = {f"s{i}": 50 * (i + 1) for i in range(6)}
    for budget in (40, 151, 400, 700, 1049, 2000, 10_000):
        _check(spark, tokens, budget, max_epochs=1.2)


MIX_ROWS = [
    (0, "a", "w w w w"),       # a: 4 tokens
    (1, "a", "w w"),           # a: +2 -> 6
    (2, "b", "w w w w w w w"), # b: 7
    (3, "c", "w"),             # c: 1
]
MIX_LATER = [
    (4, "c", "w w w w w w w w w w"),  # c grows past its old cap
    (5, "d", "w w w"),                # brand-new source
]


def _mix_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_streaming_token_counts_parity_replay_compaction(spark, tmp_path):
    import os

    from audit_star_spark.analytics.text import unimax_budget
    from audit_star_spark.streaming.mixing import StreamingTokenCounts

    st = StreamingTokenCounts(str(tmp_path / "mix"))
    assert st.unimax(spark, 10) is None
    st.apply_batch(_mix_docs(spark, MIX_ROWS[:2]), 0)
    st.apply_batch(_mix_docs(spark, MIX_ROWS[2:]), 1)

    def want(rows, budget, epochs):
        return sorted(
            tuple(r)
            for r in unimax_budget(_mix_docs(spark, rows), budget, epochs).collect()
        )

    def got(budget, epochs):
        return sorted(tuple(r) for r in st.unimax(spark, budget, epochs).collect())

    assert got(9, 1.0) == want(MIX_ROWS, 9, 1.0)
    st.apply_batch(_mix_docs(spark, MIX_ROWS[2:]), 1)  # at-least-once replay
    assert got(9, 1.0) == want(MIX_ROWS, 9, 1.0)
    st.compact(spark)
    assert got(9, 1.0) == want(MIX_ROWS, 9, 1.0)
    parts = {p for p in os.listdir(st.store_dir) if p.startswith("ingest_")}
    assert parts == {"ingest_batch_id=-1"}
    # a source straddling batches must allocate as ONE source, and late
    # growth must re-rank the capped prefix (corpus-relative: the reason
    # per-batch verdicts cannot freeze)
    st.apply_batch(_mix_docs(spark, MIX_LATER), 2)
    assert got(12, 1.0) == want(MIX_ROWS + MIX_LATER, 12, 1.0)


def test_streaming_token_counts_availablenow(spark, tmp_path):
    from audit_star_spark.analytics.text import unimax_budget
    from audit_star_spark.streaming.mixing import StreamingTokenCounts

    src = str(tmp_path / "src")
    _mix_docs(spark, MIX_ROWS).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    st = StreamingTokenCounts(str(tmp_path / "mix"))
    st.start(stream, str(tmp_path / "ck")).awaitTermination()
    assert sorted(tuple(r) for r in st.unimax(spark, 9, 1.0).collect()) == sorted(
        tuple(r)
        for r in unimax_budget(_mix_docs(spark, MIX_ROWS), 9, 1.0).collect()
    )
