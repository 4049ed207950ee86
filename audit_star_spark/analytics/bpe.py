"""Distributed BPE merge training over the ``documents`` table (north-star
layer): the tokenizer-training primitive a pretraining pipeline runs after
vocabulary induction (``text.token_topk``).

Each round: count adjacent token pairs corpus-wide, pick the most frequent
pair (ties broken lexicographically — deterministic on any engine), and
rewrite every document by greedily merging that pair left-to-right. This is
word-level BPE (Sennrich et al. 2016, arXiv:1508.07909) with tokens as the
starting alphabet.

Scale shape per round:

- pair counting: in-row transform -> explode -> hash aggregate with
  map-side combine (shuffle bounded by distinct pairs per partition);
- top-pair selection: TakeOrderedAndProject(1) + a driver .first() — a
  bounded scalar control decision per round, the same sanctioned pattern
  as dedup_clusters' convergence probe (never a data-path collect);
- rewrite: pure in-row left fold (no shuffle); the per-round result is
  persisted so round r+1 counts from materialized tokens instead of
  re-running r rewrites of lineage (the batch analog of checkpointing an
  iterative algorithm — at production scale, write to storage per round).

The greedy left-to-right merge is a fold whose carry is the accumulated
array's LAST element (merge = pop + push merged token): no auxiliary
state, so Spark ``aggregate`` and DuckDB ``list_reduce`` evaluate the
identical recurrence. (A struct-state + sentinel-flush formulation was
semantically equivalent but segfaulted DuckDB 1.0.0 when three rounds
nest — the oracle must run on the driver's DuckDB, so the shared
recurrence is the simple one.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audit_star_spark.analytics.text import TOKENS_EXPR
from audit_star_spark.util import spread

N_MERGES = 3

_PAIRS_EXPR = (
    "CASE WHEN size(toks) >= 2 THEN "
    "transform(sequence(0, size(toks) - 2), "
    "i -> named_struct('a', toks[i], 'b', toks[i + 1])) "
    "ELSE array() END"
)


def _sq(s: str) -> str:
    """Escape a token for embedding in a single-quoted Spark SQL literal.
    Backslashes must double BEFORE quote doubling: Spark's parser applies
    C-style escape processing inside string literals (``'\\b'`` would
    become backspace and silently corrupt the rewrite for any corpus
    whose winning pair contains a backslash)."""
    return s.replace("\\", "\\\\").replace("'", "''")


def _merge_expr(a: str, b: str) -> str:
    """Greedy left-to-right merge of adjacent pair (a, b) -> 'a b' over
    the ``toks`` array: left fold where the carry is the accumulated
    array's last element (correctly non-overlapping: a freshly merged
    token never re-merges as the left side of the same pair in the same
    round)."""
    a, b = _sq(a), _sq(b)
    return f"""
    aggregate(
      toks,
      CAST(array() AS array<string>),
      (s, t) -> CASE
        WHEN size(s) > 0 AND element_at(s, -1) = '{a}' AND t = '{b}'
          THEN concat(slice(s, 1, size(s) - 1), array('{a} {b}'))
        ELSE concat(s, array(t))
      END
    )
    """


def bpe_train(
    docs: DataFrame,
    n_merges: int = N_MERGES,
    materialize_last: bool = True,
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE rounds. Returns (merges, tokens) where merges
    is [(round, left, right, pair_count)] and tokens is the rewritten
    corpus (doc_id, toks) after all merges. ``materialize_last=False``
    skips persisting the final rewrite (for callers that only want the
    merge rules, the last round's corpus is dead work).

    ``checkpoint_dir``: opt-in reliable fault tolerance — each round's
    rewritten corpus checkpoints to stable storage instead of executor
    memory, so an executor loss during a long training run resumes from
    the last round instead of cascading a recompute through every
    unpersisted earlier round (plans/iterate.py has the trade)."""
    from audit_star_spark.plans.iterate import iter_materialize

    toks = spread(docs).select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
    if checkpoint_dir is not None:
        toks = iter_materialize(toks, checkpoint_dir, eager=False)
    toks.persist()
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        top = (
            toks.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .first()
        )
        if top is None:
            break
        merges.append((r, top["a"], top["b"], int(top["cnt"])))
        nxt = toks.select(
            "doc_id", F.expr(_merge_expr(top["a"], top["b"])).alias("toks")
        )
        if r < n_merges or materialize_last:
            if checkpoint_dir is not None:
                # reliable mode: the round lands on stable storage (and
                # is recomputable from it), not just executor memory
                nxt = iter_materialize(nxt, checkpoint_dir, eager=True)
            else:
                nxt.persist()
                nxt.count()  # materialize before dropping previous round
            toks.unpersist()
        toks = nxt
    return merges, toks


def bpe_apply(
    docs: DataFrame, rules: list[tuple[str, str]], persist_every: int = 8
) -> DataFrame:
    """Apply an already-trained merge-rule list (in training order) to ANY
    corpus — the inference half of the tokenizer: train once, encode every
    new shard with the frozen rules. Returns (doc_id, toks).

    Scale shape: each rule is a pure in-row fold, so the whole encode is
    shuffle-free; rules chain as nested expressions, cut every
    ``persist_every`` rules by a materialized persist so expression depth
    (and recompute-on-retry cost) stays bounded — at production scale each
    cut is a storage write, exactly like the training rounds."""
    toks = spread(docs).select("doc_id", F.expr(TOKENS_EXPR).alias("toks"))
    prev_cut = None
    for i, (a, b) in enumerate(rules, 1):
        toks = toks.select("doc_id", F.expr(_merge_expr(a, b)).alias("toks"))
        if i % persist_every == 0 and i < len(rules):
            toks.persist()
            toks.count()
            # the newly materialized cut supersedes the previous one;
            # unpersist it so cached token-corpus copies don't accumulate
            # for the whole encode (memory ~ rule count otherwise)
            if prev_cut is not None:
                prev_cut.unpersist()
            prev_cut = toks
    return toks


def bpe_transfer_stats(
    docs: DataFrame, n_merges: int = N_MERGES
) -> DataFrame:
    """Train on the even-doc_id half, encode the odd half with the frozen
    rules: per held-out document (doc_id, n_tokens_before, n_tokens_after)
    — the cross-corpus generalization check a tokenizer run ends with."""
    train = docs.filter(F.col("doc_id") % 2 == 0)
    held_out = docs.filter(F.col("doc_id") % 2 == 1)
    merges, _ = bpe_train(train, n_merges, materialize_last=False)
    encoded = bpe_apply(held_out, [(a, b) for _, a, b, _ in merges])
    before = spread(held_out).select(
        "doc_id", F.size(F.expr(TOKENS_EXPR)).cast("long").alias("n_tokens_before")
    )
    after = encoded.select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens_after")
    )
    return before.join(after, "doc_id")


def bpe_merge_table(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """(round, lhs, rhs, pair_count) — the learned merge rules."""
    merges, _toks = bpe_train(docs, n_merges, materialize_last=False)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "round int, lhs string, rhs string, pair_count long"
    )


def bpe_corpus_stats(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """Per-document compression from the learned merges:
    (doc_id, n_tokens_before, n_tokens_after)."""
    before = spread(docs).select(
        "doc_id", F.size(F.expr(TOKENS_EXPR)).cast("long").alias("n_tokens_before")
    )
    _, toks = bpe_train(docs, n_merges)
    after = toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens_after"))
    # toks stays persisted: the returned DataFrame executes lazily, and
    # unpersisting here races block eviction against that execution — when
    # eviction wins, the full k-round nested-fold lineage recomputes from
    # the raw corpus (measured 16s vs 2.3s at sf0.1). The session's
    # clearCache between queries (bench.py) or GC reclaims it.
    return before.join(after, "doc_id")
