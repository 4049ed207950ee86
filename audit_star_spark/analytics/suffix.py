"""Distributed suffix-array construction by PREFIX DOUBLING (Manber &
Myers 1993 "Suffix Arrays: A New Method for On-Line String Searches" —
the doubling formulation; the same scheme underlies every distributed
SA build), over the token streams of the corpus. Suffixes never cross
document boundaries (the per-document sentinel convention).

Why an engine wants this: the suffix order groups every repeated token
run of EVERY length — the index behind exact-substring dedup at Lee et
al. 2022 granularity, longest-repeat statistics, and tail-repetition
profiling that fixed-k shingles cannot see (k must be chosen; the SA
sees all k at once).

Algorithm: rank(h) orders suffixes by their first h tokens; then

    key(2h) = (rank_h(i), rank_h(i + h) or 0)       -- 0 = past doc end
    rank(2h) = dense rank of key(2h)

doubling h until every suffix's rank is unique (or h covers the longest
document). Shorter-suffix-is-smaller falls out of the 0 sentinel.

Scale shape: each round is one per-document ``lead(r, h)`` window (the
shifted rank — positions are contiguous from posexplode, so the lead
replaces what used to be a (doc_id, pos + h) self-join at one doc-keyed
exchange instead of two) plus a rank assignment. Two round flavors:

- COMBINE round: ``r := struct(r1, r2)`` in-row. Prefix doubling never
  needs DENSE ranks mid-ladder — any rank where equality ⟺ key
  equality and order is preserved works, and the lexicographic struct
  of two dense ranks is exactly that. A combine round therefore costs
  ONE doc-keyed window exchange and nothing else.
- DENSIFY round: dense rank of the (r1, r2) key, compressing the pair
  back to one long so key width stays bounded (two combine rounds in a
  row would square it). Dense rank is the classic global-funnel trap: a
  bare ``dense_rank() over (order by ...)`` is Exchange SinglePartition;
  the ``mode`` switch reuses the repo's gapless-id machinery
  (operators/ids.py): rank the DISTINCT key frame with the two-pass
  range-partition scheme and join back — no single-partition stage
  anywhere in 'distributed' mode; 'window' mode is the small-input/gate
  form.

Rounds strictly alternate combine/densify, which halves the expensive
densify machinery (distinct + range shuffle + count job + two join-back
exchanges per round, vs one window exchange). The LAST round densifies
only when the caller consumes rank VALUES (``final_dense``):
suffix_ranks returns them and longest_repeated_run walks rank
adjacency; the window-key/dup-profile consumers compare ranks for
EQUALITY only and skip even the final densify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from audit_star_spark.analytics.text import TOKENS_EXPR
from audit_star_spark.operators.ids import gapless_ids
from audit_star_spark.plans.iterate import iter_materialize


def _dense_ranks(df: DataFrame, key_cols: list[str], mode: str) -> DataFrame:
    """Attach ``r`` = dense rank of ``key_cols`` under their natural
    order: gapless ids over the DISTINCT key frame, joined back —
    equal keys share a rank, and no global window funnel in
    'distributed' mode."""
    keys = df.select(*key_cols).distinct()
    ranked = gapless_ids(keys, order_by=key_cols, id_col="r", mode=mode)
    return df.join(ranked, key_cols)


def _mono_ranks(df: DataFrame, key_cols: list[str], mode: str) -> DataFrame:
    """Attach ``r`` = an order- and equality-preserving id of
    ``key_cols`` that is NOT dense: mid-ladder rounds only ever compare
    ranks (order for the next round's pair key, equality for grouping),
    so the gapless machinery of :func:`_dense_ranks` (persist + count
    collect + base broadcast) is wasted there. One pass instead: rank
    the DISTINCT key frame by range-partition + in-partition sort, id =
    ``monotonically_increasing_id() + 1`` — range partitions are in key
    order and mid is (pid << 33) + local index, so the id is monotone
    in the key; +1 keeps every real rank above the 0 sentinel. Values
    are run-dependent (partition boundaries come from the range
    sampler), which is exactly why only the FINAL round — whose rank
    VALUES callers read — uses :func:`_dense_ranks`."""
    keys = df.select(*key_cols).distinct()
    if mode == "window":
        w = Window.orderBy(*key_cols)
        ranked = keys.withColumn("r", F.row_number().over(w).cast("long"))
    else:
        n = df.sparkSession.sparkContext.defaultParallelism
        ranked = (
            keys.repartitionByRange(n, *key_cols)
            .sortWithinPartitions(*key_cols)
            .withColumn("r", F.monotonically_increasing_id() + 1)
        )
    return df.join(ranked, key_cols)


def _super_round(
    cur: DataFrame,
    h: int,
    factor: int,
    mode: str,
    densify: bool = True,
    dense: bool = False,
) -> DataFrame:
    """span h -> h*factor in ONE per-document window pass: the struct
    of ranks at offsets 0, h, 2h, ..., (factor-1)*h lexicographically
    orders (and equates) suffixes by their first h*factor tokens — the
    prefix-doubling invariant generalized to any stride (Manber-Myers
    doubling is factor=2). The 0 sentinel past the doc end keeps
    shorter-is-smaller, exactly like the pair rounds. One factor-8
    superround therefore replaces three doubling rounds: same
    correctness argument, a third of the full-frame exchanges and
    materializations.

    ``densify=False`` keeps the struct itself as ``r`` (equality-only
    consumers; no further rounds may follow — a struct-of-structs key
    would double width per round). ``densify=True`` compresses the key
    back to one long via :func:`_mono_ranks` (or :func:`_dense_ranks`
    when ``dense`` — the final round of value-reading callers)."""
    if isinstance(cur.schema["r"].dataType, StructType):
        raise ValueError("superround input rank must be a long")
    w = Window.partitionBy("doc_id").orderBy("pos")
    sent = F.lit(0).cast("long")
    cols = [F.col("r").alias("k0")] + [
        F.coalesce(F.lead("r", i * h).over(w), sent).alias(f"k{i}")
        for i in range(1, factor)
    ]
    keyed = iter_materialize(cur.select("doc_id", "pos", *cols))
    key_cols = [f"k{i}" for i in range(factor)]
    if not densify:
        return keyed.select(
            "doc_id", "pos", F.struct(*key_cols).alias("r")
        )
    ranker = _dense_ranks if dense else _mono_ranks
    return iter_materialize(
        ranker(keyed, key_cols, mode).select(
            "doc_id", "pos", F.col("r").cast("long").alias("r")
        )
    )


def _ladder_factors(stop: int, stride: int = 8) -> list[int]:
    """Superround factors taking span 1 to the smallest reachable span
    >= ``stop``: full-stride rounds, with the last round's factor
    halved while the target stays reachable (so the ladder never
    overshoots by more than the power-of-two rounding)."""
    factors = []
    h = 1
    while h < stop:
        f = stride
        while f > 2 and h * (f // 2) >= stop:
            f //= 2
        factors.append(f)
        h *= f
    return factors


def _token_ranks(docs, tokens_expr: str, mode: str, dense: bool):
    """(materialized token stream, materialized rank_1 frame,
    max_len): the shared ladder initialization — tokenize + posexplode
    once, rank single tokens (h = 1). ``dense`` as in
    :func:`_super_round`."""
    toks = docs.select("doc_id", F.expr(tokens_expr).alias("toks"))
    suf = iter_materialize(
        toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    )
    max_len = suf.agg(F.max("pos")).collect()[0][0]
    max_len = 0 if max_len is None else max_len + 1
    if max_len == 0:
        raise ValueError("empty corpus: no tokens to rank")
    ranker = _dense_ranks if dense else _mono_ranks
    cur = iter_materialize(
        ranker(suf, ["tok"], mode).select(
            "doc_id", "pos", F.col("r").cast("long").alias("r")
        )
    )
    return toks, cur, max_len


def _is_pair_rank(df: DataFrame) -> bool:
    """True when ``r`` holds a combine-round pair struct (vs a dense
    long)."""
    return isinstance(df.schema["r"].dataType, StructType)


def _pair_sentinel() -> F.Column:
    """The past-doc-end rank for pair-struct rounds: struct(0, 0) sorts
    below every real pair (dense ranks start at 1, so real pairs have
    a >= 1) and equals nothing real — the same shorter-suffix-is-
    smaller convention as the long 0 sentinel."""
    return F.struct(
        F.lit(0).cast("long").alias("a"), F.lit(0).cast("long").alias("b")
    )


def _rank_lit(value) -> F.Column:
    """A literal column equal to a collected rank value — a plain long
    for densify rounds, a struct(a, b) Row for combine rounds (pyspark
    has no F.lit for Rows)."""
    if isinstance(value, (int, float)):
        return F.lit(value)
    return F.struct(
        F.lit(value[0]).cast("long").alias("a"),
        F.lit(value[1]).cast("long").alias("b"),
    )


def _shift_pair(cur: DataFrame, h: int) -> DataFrame:
    """(doc_id, pos, r1, r2) from a rank frame (doc_id, pos, r): r1 =
    this suffix's rank, r2 = the rank ``h`` positions later in the SAME
    document (the sentinel past the doc end — shorter-is-smaller).

    ``lead(r, h)`` over the per-document position order replaces the
    earlier (doc_id, pos + h) self-join: positions are contiguous
    0..len-1 from posexplode, so the lead IS the shifted rank — one
    doc-keyed exchange + local sort instead of shuffling BOTH join
    sides by (doc_id, pos). Documents are bounded (KBs–MBs of text),
    so the per-doc window groups cannot skew a task at any corpus
    size."""
    sentinel = (
        _pair_sentinel() if _is_pair_rank(cur) else F.lit(0).cast("long")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return cur.select(
        "doc_id",
        "pos",
        F.col("r").alias("r1"),
        F.coalesce(F.lead("r", h).over(w), sentinel).alias("r2"),
    )


def _rank_round(cur: DataFrame, h: int, mode: str, densify: bool) -> DataFrame:
    """One doubling round: rank(2h) from (rank_h(pos), rank_h(pos + h)).

    ``densify=False`` (combine): the new rank IS the pair, as a struct
    — order-preserving (lexicographic struct compare is pair order) and
    equality ⟺ key equality, which is all the doubling invariant needs.
    One window exchange, one materialization, nothing else.

    ``densify=True``: dense rank of the pair via the mode-switched
    gapless-id machinery, compressing the key back to one long. The
    shifted pair frame is materialized FIRST so the three downstream
    passes that need it (the range-partitioner sample inside
    gapless_ids, the distinct-key fill, the join-back) read
    checkpointed blocks instead of re-executing the shift — the
    un-materialized form re-ran the shift join 3x per round (measured
    ~2x the round wall at sf0.1)."""
    if not densify:
        return iter_materialize(
            _shift_pair(cur, h).select(
                "doc_id",
                "pos",
                F.struct(
                    F.col("r1").alias("a"), F.col("r2").alias("b")
                ).alias("r"),
            )
        )
    keyed = iter_materialize(_shift_pair(cur, h))
    return iter_materialize(
        _dense_ranks(keyed, ["r1", "r2"], mode).select(
            "doc_id", "pos", F.col("r").cast("long").alias("r")
        )
    )


def _round_plan(n_rounds: int, final_dense: bool) -> list[bool]:
    """densify flags per round: strict alternation (two combine rounds
    in a row would square the key width), anchored at the LAST round —
    dense when the caller reads rank values, combine when only rank
    equality is consumed."""
    plan = []
    dense = final_dense
    for _ in range(n_rounds):
        plan.append(dense)
        dense = not dense
    return list(reversed(plan))


def _suffix_rank_history(
    docs: DataFrame,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
    max_h: int | None = None,
    final_dense: bool = True,
) -> list[tuple[int, DataFrame]]:
    """The full doubling ladder: [(h, rank_h frame)] for h = 1, 2, 4,
    ..., 2^ceil(log2(longest document)) — rank_h orders suffixes by
    their first h tokens (0-sentinel: shorter-is-smaller). Each frame
    is (doc_id, pos, r), materialized with truncated lineage. Keeping
    the ladder (instead of discarding all but the last round) is what
    makes Manber–Myers LCP derivation possible WITHOUT ever
    materializing per-suffix token slices — O(n log n) scalar rows
    total, zero token arrays. ``max_h`` stops the ladder once rank_h
    for that span is built (a consumer that only needs prefix-equality
    at one fixed span — suffix_window_keys — pays only
    log2(max_h) rounds, not log2(longest document)). ``final_dense``
    as in _round_plan: callers that only compare ranks for equality
    skip even the last densify."""
    toks = docs.select("doc_id", F.expr(tokens_expr).alias("toks"))
    # materialize the exploded token stream ONCE: the max-length probe
    # and the round-0 ranking otherwise each re-run the tokenize +
    # posexplode scan of the raw corpus
    suf = iter_materialize(
        toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    )
    max_len = suf.agg(F.max("pos")).collect()[0][0]
    max_len = 0 if max_len is None else max_len + 1
    if max_len == 0:
        raise ValueError("empty corpus: no tokens to rank")
    cur = iter_materialize(
        _dense_ranks(suf, ["tok"], mode).select(
            "doc_id", "pos", F.col("r").cast("long").alias("r")
        )
    )
    history = [(1, cur)]
    # no per-round all-unique probe: identical suffixes (ubiquitous in
    # real corpora — any shared final token) keep ranks tied forever,
    # so the probe is a wasted job per round; the loop is bounded by
    # ceil(log2(longest document)) regardless
    stop = max_len if max_h is None else min(max_len, max_h)
    plan = _round_plan(max(0, (stop - 1).bit_length()), final_dense)
    h = 1
    for densify in plan:
        cur = _rank_round(cur, h, mode, densify)
        h *= 2
        history.append((h, cur))
    return history


def suffix_ranks(
    docs: DataFrame,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
) -> DataFrame:
    """(doc_id, pos, rank): the lexicographic dense rank of every token
    suffix (pos is 0-based; equal suffixes — across documents too —
    share a rank). ``mode`` as in operators/ids.py."""
    _h, cur = _suffix_rank_history(docs, tokens_expr, mode)[-1]
    return cur.select("doc_id", "pos", F.col("r").alias("rank"))


def suffix_window_keys(
    docs: DataFrame,
    k: int,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
) -> DataFrame:
    """(doc_id, pos, r1, r2): for every position that admits a full
    k-token window (pos <= doc_len - k, 0-based), a rank pair that
    identifies the window's k tokens EXACTLY — two windows are equal
    iff their (r1, r2) pairs are equal. The classic overlapping
    power-of-two trick: with h = the largest power of two <= k,
    r1 = rank_h(pos) and r2 = rank_h(pos + k - h); the two h-spans
    cover [0, k) because 2h > k, and rank_h equality is exact h-token
    prefix equality for suffixes of length >= h (both are, by the
    pos <= doc_len - k filter). Unlike md5 window hashing this is
    collision-FREE, costs O(1) per window instead of O(k) hashing
    work, and reuses only log2(k) doubling rounds (``max_h``)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = 1 << (k.bit_length() - 1)  # largest power of two <= k
    # window keys are compared for EQUALITY only (groupBy/join on
    # (r1, r2)), so every rank on this path is _mono_ranks and the LAST
    # superround skips even that: its struct key IS the rank. For the
    # ubiquitous min_len <= 8 settings the whole ladder is ONE
    # superround over the token ranks — down from three doubling
    # rounds (two window exchanges + one full densify).
    _toks, cur, _max_len = _token_ranks(docs, tokens_expr, mode, dense=False)
    factors = _ladder_factors(h)
    span = 1
    for i, f in enumerate(factors):
        cur = _super_round(
            cur, span, f, mode, densify=i < len(factors) - 1
        )
        span *= f
    rank_h = cur
    # if every document is shorter than h (<= k), the ladder stops
    # early — but then no position passes the pos <= doc_len - k
    # filter either, so the (then-meaningless) key is never emitted.
    # r2 = rank_h at pos + (k - h): a lead over the SAME per-document
    # window (positions are contiguous), and doc_len = max(pos) + 1
    # over the same doc partition — one window exchange replaces the
    # earlier shifted self-join plus a re-tokenizing doc-length join.
    w = Window.partitionBy("doc_id").orderBy("pos")
    shifted = F.col("r") if k == h else F.lead("r", k - h).over(w)
    return (
        rank_h.select(
            "doc_id",
            "pos",
            F.col("r").alias("r1"),
            shifted.alias("r2"),
            F.max("pos").over(Window.partitionBy("doc_id")).alias("__mx"),
        )
        .filter(F.col("pos") <= F.col("__mx") + 1 - k)
        .select("doc_id", "pos", "r1", "r2")
    )


def suffix_dup_profile(
    docs: DataFrame,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
    max_h: int | None = None,
) -> DataFrame:
    """Repetition-by-length profile from the doubling rounds: at each
    power-of-two span h, how many suffixes share their first-h tokens
    with another suffix (and how many distinct duplicated groups) —
    the all-k view of corpus repetition a fixed-k shingle pass cannot
    give. Returns (h, n_dup_suffixes, n_dup_groups), h = 1, 2, 4, ...

    The driver-gate oracle for this is definitionally INDEPENDENT: it
    regroups suffixes by their literal first-h token slices per h,
    never running the doubling — rank(h) equality and slice equality
    must coincide exactly (truncation keeps shorter-vs-longer suffixes
    distinct, exactly like the 0 sentinel).

    Scale shape: ranks here are consumed for EQUALITY only, so no span
    needs a materialized rank frame of its own — span h groups on the
    struct of base ranks at offsets 0, b, ..., h-b (one per-document
    lead window, m = h/b <= 4 probes), and a new base (a factor-4
    superround, mono-densified) is built only when the NEXT span would
    need more than 4 probes. max_h=16 therefore materializes ONE
    ladder round (1 -> 4) instead of four doubling rounds."""
    _toks, base, max_len = _token_ranks(docs, tokens_expr, mode, dense=False)
    out_rows = []
    spark = docs.sparkSession
    w = Window.partitionBy("doc_id").orderBy("pos")

    def profile(h: int, bspan: int) -> None:
        m = h // bspan
        if m == 1:
            key = F.col("r")
        else:
            sent = F.lit(0).cast("long")
            key = F.struct(
                F.col("r").alias("k0"),
                *[
                    F.coalesce(F.lead("r", i * bspan).over(w), sent).alias(
                        f"k{i}"
                    )
                    for i in range(1, m)
                ],
            )
        g = (
            base.select(key.alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
        )
        row = g.agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("n_dup"),
            F.count("*").alias("n_groups"),
        ).collect()[0]
        out_rows.append((h, int(row["n_dup"]), int(row["n_groups"])))

    profile(1, 1)
    h, bspan = 1, 1
    limit = max_h or max_len
    while h < limit:
        if out_rows[-1][1] == 0:
            break
        h *= 2
        if h > 4 * bspan:
            base = _super_round(base, bspan, 4, mode, densify=True)
            bspan *= 4
        profile(h, bspan)
    # once no suffix shares its first-h tokens, larger spans cannot
    # create duplicates — pad the remaining power-of-two rows with
    # zeros so the emitted h set is a pure function of max_h (the
    # independent oracle computes the same fixed set)
    while h < limit:
        h *= 2
        out_rows.append((h, 0, 0))
    return spark.createDataFrame(
        out_rows, "h int, n_dup_suffixes long, n_dup_groups long"
    )


def longest_repeated_run(
    docs: DataFrame,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
) -> DataFrame:
    """ONE row (run_len, run, n_occurrences): the LONGEST token run
    appearing at least twice in the corpus (across or within
    documents), ties broken by the lexicographically smallest run —
    the suffix-array classic (the answer is always the longest common
    prefix of two suffixes ADJACENT in suffix order).

    Shape — LCP FROM RANKS (Manber & Myers), never from token arrays:
    - identical suffixes (same final dense rank, group > 1): candidate
      run length = the whole suffix length (doc_len - pos, a scalar
      join against the per-DOCUMENT length frame);
    - adjacent DISTINCT ranks r, r+1 (one representative each, a
      groupBy-min): LCP by descending the doubling ladder — at each
      kept round h (largest first), if rank_h agrees at the pair's
      current offsets, the suffixes share h more tokens: advance both
      offsets by h and add h. Binary greedy over the power-of-two
      ladder is exact (0-sentinel ranks make a short-vs-long tie
      impossible for distinct suffixes), so the LCP needs only
      log2(longest doc) rounds of two (doc_id, pos)-keyed scalar
      joins over the #ranks-row pair frame.
    Token text is materialized ONLY for the max-length candidates
    (the tie-break set) — no per-suffix token slice is ever persisted
    or shuffled (the O(sum L_i^2) blowup the first version had).
    ``n_occurrences`` counts suffixes whose first run_len tokens equal
    the run, FROM THE LADDER: with h = the largest power of two <=
    run_len and d = run_len - h, the spans [0, h) and [d, d + h)
    cover [0, run_len), so a suffix starts an occurrence iff its
    rank_h agrees with the winner's at both offsets (collision-free;
    the 0-sentinel keeps shorter suffixes on distinct ranks) — two
    filtered scans of the already-materialized rank_h frame plus one
    equi-join, replacing the earlier in-row slice-compare rescan whose
    compute was O(L * run_len) per document (quadratic for a
    pathological run_len ~ L/2 corpus)."""
    toks = docs.select("doc_id", F.expr(tokens_expr).alias("toks"))
    history = _suffix_rank_history(docs, tokens_expr, mode)
    _hf, final = history[-1]
    # doc lengths from the materialized rank frame (max pos + 1 per doc,
    # map-side partial agg) — not from a second tokenize scan of docs
    doc_len = iter_materialize(
        final.groupBy("doc_id").agg((F.max("pos") + 1).alias("__dl"))
    )
    # one representative per final rank (identical suffixes: any member
    # is exact) + the group size for the within-rank branch
    rep = (
        final.groupBy("r")
        .agg(
            F.count("*").alias("grp"),
            F.min(F.struct("doc_id", "pos")).alias("m"),
        )
        .select(
            F.col("r").alias("rank"),
            "grp",
            F.col("m.doc_id").alias("doc_id"),
            F.col("m.pos").alias("pos"),
        )
    )
    rep = iter_materialize(rep)
    # within-rank duplicates: the whole suffix repeats
    within = iter_materialize(
        rep.filter(F.col("grp") > 1)
        .join(doc_len, "doc_id")
        .select(
            (F.col("__dl") - F.col("pos")).cast("int").alias("run_len"),
            "doc_id",
            "pos",
        )
    )
    # adjacent distinct ranks: LCP by descending-h rank agreement
    nxt = rep.select(
        (F.col("rank") - 1).alias("rank"),
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
    )
    pairs = rep.join(nxt, "rank").select(
        F.col("doc_id").alias("d1"),
        F.col("pos").alias("p1"),
        "d2",
        "p2",
        F.col("pos").alias("a"),
        F.col("p2").alias("b"),
        F.lit(0).alias("lcp"),
    )
    # the TOP ladder round is the final rank table itself: the pair's
    # offsets start at the representatives' own positions, whose final
    # ranks are r and r+1 — distinct by construction — so that round
    # can never match and is always skipped. Exactness is preserved:
    # the remaining powers sum to h_top - 1 >= max_len - 1 >= any LCP
    # of two distinct suffixes.
    #
    # BRANCH AND BOUND: before round h a pair can still add at most
    # 2h - 1 to its lcp (h + h/2 + ... + 1), so any pair with
    # lcp + 2h - 1 < bound — the best run length seen so far, seeded by
    # the within-rank branch and raised by each round's max pair lcp —
    # can neither win nor tie and is dropped (the max-length tie-break
    # set is intact: a pair able to EQUAL the bound satisfies the
    # filter). One bounded scalar collect per round buys descent frames
    # that collapse to the contenders after the first matching round;
    # once the live set fits a broadcast, the rank lookups flip from
    # two full sort-merge shuffles of rank_h to broadcast hash probes
    # that only STREAM the materialized rank blocks.
    bound = within.agg(F.max("run_len")).collect()[0][0] or 0
    n_live = rep.count() - 1  # adjacent pairs = ranks with a successor
    descent = list(reversed(history))[1:]
    for h, rank_h in descent:
        live = pairs.filter(F.col("lcp") + (2 * h - 1) >= F.lit(bound))
        if n_live == 0:
            pairs = live
            break
        ra = rank_h.select(
            F.col("doc_id").alias("d1"),
            F.col("pos").alias("a"),
            F.col("r").alias("__ra"),
        )
        rb = rank_h.select(
            F.col("doc_id").alias("d2"),
            F.col("pos").alias("b"),
            F.col("r").alias("__rb"),
        )
        if n_live <= 200_000:
            # bounded live set: find the matched pairs with two inner
            # joins that broadcast the SMALL side, then flag-join them
            # back (also broadcast) — rank_h is never exchanged
            hit = (
                F.broadcast(live.select("d1", "a", "d2", "b"))
                .join(ra, ["d1", "a"])
                .join(rb, ["d2", "b"])
                .filter(F.col("__ra") == F.col("__rb"))
                .select("d1", "a", "d2", "b", F.lit(1).alias("__m"))
            )
            match = F.col("__m").isNotNull()
            joined = live.join(F.broadcast(hit), ["d1", "a", "d2", "b"], "left")
        else:
            match = (
                F.col("__ra").isNotNull()
                & F.col("__rb").isNotNull()
                & (F.col("__ra") == F.col("__rb"))
            )
            joined = live.join(ra, ["d1", "a"], "left").join(
                rb, ["d2", "b"], "left"
            )
        # truncate EVERY round (forked-DAG rule): a two-round lineage
        # was measured 2-4x slower at sf0.1 — the joined rank tables
        # re-enter planning each round and the deferred plan replays
        pairs = iter_materialize(
            joined.select(
                "d1",
                "p1",
                "d2",
                "p2",
                F.when(match, F.col("a") + h).otherwise(F.col("a")).alias("a"),
                F.when(match, F.col("b") + h).otherwise(F.col("b")).alias("b"),
                F.when(match, F.col("lcp") + h)
                .otherwise(F.col("lcp"))
                .alias("lcp"),
            )
        )
        stat = pairs.agg(
            F.count("*").alias("n"), F.max("lcp").alias("m")
        ).collect()[0]
        n_live, bound = int(stat["n"]), max(bound, int(stat["m"] or 0))
    adjacent = pairs.filter(F.col("lcp") > 0).select(
        F.col("lcp").cast("int").alias("run_len"),
        F.col("d1").alias("doc_id"),
        F.col("p1").alias("pos"),
    )
    cands = within.unionByName(adjacent)
    mx = cands.agg(F.max("run_len").alias("run_len"))
    # token text ONLY for the (bounded) max-length tie-break set
    best = (
        cands.join(F.broadcast(mx), "run_len")
        .join(toks, "doc_id")
        .select(
            "run_len",
            "doc_id",
            "pos",
            F.expr("concat_ws(' ', slice(toks, pos + 1, run_len))").alias(
                "run"
            ),
        )
        .orderBy(F.col("run").asc())
        .limit(1)
    )
    out_schema = "run_len int, run string, n_occurrences long"
    spark = docs.sparkSession
    wrows = best.collect()  # bounded: exactly the winner row (or none)
    if not wrows:
        return spark.createDataFrame([], out_schema)
    w = wrows[0]
    run_len, wd, wp = int(w["run_len"]), w["doc_id"], int(w["pos"])
    # occurrence count from the ladder (see docstring): the winner's
    # rank_h at offsets 0 and d, then count suffixes agreeing at both
    h = 1 << (run_len.bit_length() - 1)  # largest power of two <= L
    d = run_len - h
    rank_h = dict(history)[h]
    wr = {
        int(r["pos"]): r["r"]
        for r in rank_h.filter(
            (F.col("doc_id") == wd) & F.col("pos").isin(wp, wp + d)
        ).collect()
    }  # bounded: at most 2 rows
    # _rank_lit: the collected winner rank is a long on densify rounds
    # and a struct Row on combine rounds
    m1 = rank_h.filter(F.col("r") == _rank_lit(wr[wp])).select(
        "doc_id", "pos"
    )
    if d == 0:
        n = m1.count()
    else:
        m2 = rank_h.filter(F.col("r") == _rank_lit(wr[wp + d])).select(
            "doc_id", (F.col("pos") - d).alias("pos")
        )
        n = m1.join(m2, ["doc_id", "pos"]).count()
    return spark.createDataFrame([(run_len, w["run"], int(n))], out_schema)
