"""Unicode-aware tokenizer: NFC-lite composition + punctuation-aware
splitting. The DuckDB value-parity half lives in test_oracle_parity
(query ``unicode_token_stats``); this locks the collapse contract
directly."""

from audit_star_spark.analytics.text import NFC_PAIRS, unicode_token_stats


def test_nfc_pairs_derived_not_empty():
    assert len(NFC_PAIRS) > 50
    # composed side is always a single precomposed codepoint
    assert all(len(d) == 2 and len(c) == 1 for d, c in NFC_PAIRS)


def test_decomposed_and_precomposed_collapse(spark):
    docs = spark.createDataFrame(
        [(1, "plain words here")], "doc_id long, text string"
    )
    row = unicode_token_stats(docs).collect()[0]
    # suffix contributes: cafe x3 forms -> one distinct token, uber x2
    assert row["n_cafe"] == 3
    assert row["n_uber"] == 2
    # punctuation-aware: 'end.' tokenizes to 'end' (no trailing dot), and
    # the em-dash never becomes a token: 3 body + 7 suffix tokens
    assert row["n_tokens"] == 10


def test_text_stats_accepts_unicode_tokenizer(spark):
    from audit_star_spark.analytics.text import (
        TOKENS_EXPR_UNICODE,
        with_text_stats,
    )

    docs = spark.createDataFrame(
        [(1, "Café visits: twelve.")], "doc_id long, text string"
    )
    row = with_text_stats(docs, tokens_expr=TOKENS_EXPR_UNICODE).collect()[0]
    assert row["n_tokens"] == 3  # café / visits / twelve — punctuation split off


def test_vocab_coverage_threads_tokenizer_through_vocab(spark):
    """With the Unicode tokenizer, vocabulary induction must use the same
    tokenizer as the coverage count — otherwise normalized tokens look
    OOV against a whitespace-token vocab."""
    from audit_star_spark.analytics.text import (
        TOKENS_EXPR_UNICODE,
        vocab_coverage,
    )

    docs = spark.createDataFrame(
        [(i, "s", "en", "Café Café café.") for i in range(4)],
        "doc_id long, source string, lang string, text string",
    )
    [row] = vocab_coverage(
        docs, vocab_k=5, tokens_expr=TOKENS_EXPR_UNICODE
    ).collect()
    # all forms normalize to one in-vocab token: zero OOV
    assert row["n_tokens"] == 12 and row["n_oov"] == 0
