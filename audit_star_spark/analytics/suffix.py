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

Algorithm: rank(h) orders suffixes by their first h tokens; then for
any stride F (Manber-Myers doubling is F = 2):

    key(F*h) = (rank_h(i), rank_h(i+h), ..., rank_h(i+(F-1)h))
    rank(F*h) = rank of key(F*h)           -- 0 = past doc end

growing h until it covers the longest document.
Shorter-suffix-is-smaller falls out of the 0 sentinel.

Scale shape: each SUPERROUND is one per-document window pass computing
``lead(r, i*h)`` for i < F (positions are contiguous from posexplode,
so the leads ARE the shifted ranks — one doc-keyed exchange replaces
what used to be per-doubling self-joins) plus one rank compression.
F = 8 means a third of the rounds, materializations and full-frame
exchanges of the classic F = 2 ladder. Rank compression comes in two
strengths:

- MONO (mid-ladder, and the whole ladder for equality-only consumers):
  later rounds only read rank ORDER and EQUALITY, never values, so the
  distinct key frame is range-partitioned + sorted and ids come from
  ``monotonically_increasing_id()`` — one pass, no count job, no base
  broadcast. Equality-only consumers (window keys, dup profile) skip
  even that on their last round: the lead-struct itself is the key.
- DENSE (the final round of value-reading callers): the gapless-id
  machinery (operators/ids.py) over the distinct key frame — dense
  rank is the classic global-funnel trap (a bare ``dense_rank() over
  (order by ...)`` is Exchange SinglePartition); the ``mode`` switch
  uses the two-pass range-partition scheme instead — no
  single-partition stage anywhere in 'distributed' mode; 'window'
  mode is the small-input/gate form.

Spans absent from the sparse ladder are recoverable without extra
rounds: agreement at span s is the conjunction of s/b base-b rank
agreements at offsets 0, b, ..., s-b for any ladder span b | s — the
LCP descent and occurrence count in longest_repeated_run probe exactly
that way, and the whole descent tail below span 8 folds into one
token-rank pass.
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


def _token_stream(docs, tokens_expr: str):
    """(toks frame, materialized (doc_id, pos, tok) stream, max_len):
    tokenize + posexplode ONCE — the max-length probe and the round-0
    ranking otherwise each re-run the tokenize scan of the raw
    corpus."""
    toks = docs.select("doc_id", F.expr(tokens_expr).alias("toks"))
    suf = iter_materialize(
        toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    )
    max_len = suf.agg(F.max("pos")).collect()[0][0]
    max_len = 0 if max_len is None else max_len + 1
    if max_len == 0:
        raise ValueError("empty corpus: no tokens to rank")
    return toks, suf, max_len


def _token_ranks(docs, tokens_expr: str, mode: str, dense: bool):
    """(materialized token stream, materialized rank_1 frame,
    max_len): the shared ladder initialization — tokenize + posexplode
    once, rank single tokens (h = 1). ``dense`` as in
    :func:`_super_round`."""
    toks, suf, max_len = _token_stream(docs, tokens_expr)
    ranker = _dense_ranks if dense else _mono_ranks
    cur = iter_materialize(
        ranker(suf, ["tok"], mode).select(
            "doc_id", "pos", F.col("r").cast("long").alias("r")
        )
    )
    return toks, cur, max_len


def _suffix_rank_history(
    docs: DataFrame,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
) -> list[tuple[int, DataFrame]]:
    """The sparse superround ladder: [(span, rank frame)] for spans 1,
    8, 64, ..., top (the smallest reachable span >= the longest
    document) — rank_span orders suffixes by their first ``span``
    tokens (0-sentinel: shorter-is-smaller). Each frame is (doc_id,
    pos, r) with r a LONG, materialized with truncated lineage:
    mid-ladder spans are mono-ranked (order+equality is all later
    rounds read), the FINAL span is gapless-dense (its values ARE the
    suffix ranks callers consume, and rank+group-size adjacency in
    longest_repeated_run needs dense values). Keeping the ladder
    (instead of discarding all but the last round) is what makes
    Manber–Myers LCP derivation possible WITHOUT ever materializing
    per-suffix token slices; intermediate powers of two are absent but
    recoverable — span s agreement between two positions is the
    conjunction of s/b base-b rank agreements at offsets 0, b, ...,
    s-b for any ladder span b dividing s (the descent helpers below do
    exactly that)."""
    _toks, suf, max_len = _token_stream(docs, tokens_expr)
    factors = _ladder_factors(max_len)
    ranker = _dense_ranks if not factors else _mono_ranks
    cur = iter_materialize(
        ranker(suf, ["tok"], mode).select(
            "doc_id", "pos", F.col("r").cast("long").alias("r")
        )
    )
    history = [(1, cur)]
    span = 1
    for i, f in enumerate(factors):
        cur = _super_round(
            cur, span, f, mode, densify=True, dense=i == len(factors) - 1
        )
        span *= f
        history.append((span, cur))
    return history


def _span_probe(
    live: DataFrame,
    rank_b: DataFrame,
    b0: int,
    m: int,
    s: int,
    small: bool,
) -> DataFrame:
    """One LCP descent round at span ``s`` tested as ``m`` = s/b0
    probes of the base-``b0`` rank frame: two suffixes agree on their
    next ``s`` tokens iff rank_b0 is present AND equal at offsets 0,
    b0, ..., s-b0 on both sides (a missing row is past the doc end —
    distinct suffixes with identically-truncated equal content are
    impossible, so present-and-equal everywhere is exact). Exploding
    the probe offsets keeps the round at two rank joins plus one
    regroup regardless of ``m``; ``small`` switches to the
    broadcast-the-live-side shape so rank_b is only streamed."""
    pair_cols = ["d1", "p1", "d2", "p2", "a", "b", "lcp"]
    probes = live.select(
        *pair_cols,
        F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("__j"),
    ).select(
        *pair_cols,
        (F.col("a") + F.col("__j") * b0).alias("__pa"),
        (F.col("b") + F.col("__j") * b0).alias("__pb"),
    )
    ra = rank_b.select(
        F.col("doc_id").alias("d1"),
        F.col("pos").alias("__pa"),
        F.col("r").alias("__ra"),
    )
    rb = rank_b.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("__pb"),
        F.col("r").alias("__rb"),
    )
    if small:
        hit = (
            F.broadcast(probes)
            .join(ra, ["d1", "__pa"])
            .join(rb, ["d2", "__pb"])
            .filter(F.col("__ra") == F.col("__rb"))
            .groupBy("d1", "p1", "d2", "p2")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") == m)
            .select("d1", "p1", "d2", "p2", F.lit(1).alias("__m"))
        )
        match = F.col("__m").isNotNull()
        g = live.join(F.broadcast(hit), ["d1", "p1", "d2", "p2"], "left")
    else:
        ok = (
            F.col("__ra").isNotNull()
            & F.col("__rb").isNotNull()
            & (F.col("__ra") == F.col("__rb"))
        ).cast("int")
        g = (
            probes.join(ra, ["d1", "__pa"], "left")
            .join(rb, ["d2", "__pb"], "left")
            .groupBy(*pair_cols)
            .agg(F.min(ok).alias("__ok"))
        )
        match = F.col("__ok") == 1
    return g.select(
        "d1",
        "p1",
        "d2",
        "p2",
        F.when(match, F.col("a") + s).otherwise(F.col("a")).alias("a"),
        F.when(match, F.col("b") + s).otherwise(F.col("b")).alias("b"),
        F.when(match, F.col("lcp") + s).otherwise(F.col("lcp")).alias("lcp"),
    )


def _lcp_endgame(live: DataFrame, rank1: DataFrame, s: int) -> DataFrame:
    """Fold every remaining descent round (spans s, s/2, ..., 1) into
    ONE probe pass: entering span ``s``, a pair's residual LCP
    extension is at most 2s - 1, so token-rank (span-1) agreement at
    offsets 0..2s-2 determines it exactly — the extension is the index
    of the first disagreeing offset (a missing row is past the doc
    end: the extension stops there), or 2s - 1 when every probe
    agrees (the maximum the residual can be). One round of two rank
    joins + a regroup replaces log2(s) + 1 rounds of the same."""
    w = 2 * s - 1
    pair_cols = ["d1", "p1", "d2", "p2", "lcp"]
    probes = live.select(
        *pair_cols,
        "a",
        "b",
        F.explode(F.array(*[F.lit(j) for j in range(w)])).alias("__j"),
    ).select(
        *pair_cols,
        (F.col("a") + F.col("__j")).alias("__pa"),
        (F.col("b") + F.col("__j")).alias("__pb"),
        "__j",
    )
    ra = rank1.select(
        F.col("doc_id").alias("d1"),
        F.col("pos").alias("__pa"),
        F.col("r").alias("__ra"),
    )
    rb = rank1.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("__pb"),
        F.col("r").alias("__rb"),
    )
    ok = (
        F.col("__ra").isNotNull()
        & F.col("__rb").isNotNull()
        & (F.col("__ra") == F.col("__rb"))
    )
    return (
        probes.join(ra, ["d1", "__pa"], "left")
        .join(rb, ["d2", "__pb"], "left")
        .groupBy(*pair_cols)
        .agg(
            F.coalesce(
                F.min(F.when(~ok, F.col("__j"))), F.lit(w)
            ).alias("__extra")
        )
        .select(
            "d1",
            "p1",
            "d2",
            "p2",
            (F.col("lcp") + F.col("__extra")).alias("lcp"),
        )
    )


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
    needs a materialized rank frame of its own — every span probeable
    from the current base (m = h/b <= 4) is answered by ONE shared
    pass: a single per-document lead window computes the base ranks at
    offsets 0, b, 2b, 3b once, each position fans out to one (h, key)
    row per span in the epoch (keys for smaller m pad with the 0
    sentinel — constant fields, same equality classes), and one
    groupBy(h, key) + per-h rollup answers the whole epoch in one
    exchange + one action. A new base (a factor-4 superround,
    mono-densified) is built only when the NEXT span would need more
    than 4 probes. max_h=16 therefore runs TWO epoch passes ({1,2,4}
    off the token ranks, {8,16} off one materialized factor-4 round)
    instead of five per-span groupBys and four window passes."""
    _toks, base, max_len = _token_ranks(docs, tokens_expr, mode, dense=False)
    spark = docs.sparkSession
    limit = max_h or max_len
    # the emitted h set is a pure function of max_h (the independent
    # oracle computes the same fixed set)
    spans = [1]
    while spans[-1] < limit:
        spans.append(spans[-1] * 2)
    w = Window.partitionBy("doc_id").orderBy("pos")
    sent = F.lit(0).cast("long")
    out: dict[int, tuple[int, int]] = {}
    bspan, i = 1, 0
    while i < len(spans):
        epoch = [h for h in spans[i:] if h // bspan <= 4]
        ms = [h // bspan for h in epoch]
        mx = max(ms)
        led = base.select(
            F.col("r").alias("l0"),
            *[
                F.coalesce(F.lead("r", j * bspan).over(w), sent).alias(
                    f"l{j}"
                )
                for j in range(1, mx)
            ],
        )
        entries = F.array(
            *[
                F.struct(
                    F.lit(h).alias("h"),
                    *[
                        (F.col(f"l{j}") if j < m else sent).alias(f"k{j}")
                        for j in range(mx)
                    ],
                )
                for h, m in zip(epoch, ms)
            ]
        )
        rows = (
            led.select(F.explode(entries).alias("e"))
            .select("e.*")
            .groupBy("h", *[f"k{j}" for j in range(mx)])
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
            .groupBy("h")
            .agg(F.sum("c").alias("n_dup"), F.count("*").alias("n_groups"))
            .collect()
        )
        got = {
            int(r["h"]): (int(r["n_dup"]), int(r["n_groups"])) for r in rows
        }
        for h in epoch:
            out[h] = got.get(h, (0, 0))
        i += len(epoch)
        if i >= len(spans) or out[epoch[-1]][0] == 0:
            # once no suffix shares its first-h tokens, larger spans
            # cannot create duplicates — pad the rest with zeros
            for h in spans[i:]:
                out[h] = (0, 0)
            break
        base = _super_round(base, bspan, 4, mode, densify=True)
        bspan *= 4
    return spark.createDataFrame(
        [(h, out[h][0], out[h][1]) for h in spans],
        "h int, n_dup_suffixes long, n_dup_groups long",
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
    the run, FROM THE LADDER: with b = the largest ladder span <=
    run_len, base-b spans at offsets 0, b, ... plus an overlapping
    run_len - b tail cover [0, run_len), so a suffix starts an
    occurrence iff its rank_b agrees with the winner's at every offset
    (collision-free; the 0-sentinel keeps shorter suffixes on distinct
    ranks) — a bounded number of filtered scans of the
    already-materialized rank_b frame plus equi-joins, replacing the
    earlier in-row slice-compare rescan whose compute was
    O(L * run_len) per document (quadratic for a pathological
    run_len ~ L/2 corpus)."""
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
    # the TOP ladder span is the final rank table itself: the pair's
    # offsets start at the representatives' own positions, whose final
    # ranks are r and r+1 — distinct by construction — so that span
    # can never match and the descent starts at top/2. Exactness is
    # preserved: the remaining powers sum to top - 1 >= max_len - 1 >=
    # any LCP of two distinct suffixes. Spans absent from the sparse
    # ladder are tested as s/b base-b probes (_span_probe), and the
    # whole tail s <= 8 folds into one token-rank pass (_lcp_endgame).
    #
    # BRANCH AND BOUND: before round s a pair can still add at most
    # 2s - 1 to its lcp (s + s/2 + ... + 1), so any pair with
    # lcp + 2s - 1 < bound — the best run length seen so far, seeded by
    # the within-rank branch and raised by each round's max pair lcp —
    # can neither win nor tie and is dropped (the max-length tie-break
    # set is intact: a pair able to EQUAL the bound satisfies the
    # filter). One bounded scalar collect per round buys descent frames
    # that collapse to the contenders after the first matching round;
    # once the live set fits a broadcast, the rank lookups flip to
    # broadcast hash probes that only STREAM the materialized blocks.
    bound = within.agg(F.max("run_len")).collect()[0][0] or 0
    n_live = rep.count() - 1  # adjacent pairs = ranks with a successor
    spans = [h for h, _f in history]
    by_span = dict(history)
    s = spans[-1] // 2
    while s >= 1:
        live = pairs.filter(F.col("lcp") + (2 * s - 1) >= F.lit(bound))
        if n_live == 0:
            pairs = live
            break
        small = n_live <= 200_000
        if s <= 8 and small:
            # bounded live set, residual extension < 2s: one token-rank
            # pass resolves every remaining round exactly
            pairs = iter_materialize(_lcp_endgame(live, by_span[1], s))
            break
        base = max(b for b in spans if b <= s)
        m = s // base
        rank_b = by_span[base]
        if m > 1 and not small:
            # LARGE live set at a span the sparse ladder skipped (the
            # all-pairs-tie regime — near-replica corpora where B&B
            # cannot prune): exploding m probes corpus-wide would
            # multiply the join input m-fold, so materialize the span
            # ONCE as a struct-key frame (one per-document window pass,
            # no densify — probes only test equality) and join at
            # m = 1, exactly the dense-ladder shape. Probe-certified:
            # without this switch the x10 replica probe read 119.6 s
            # (exponent 0.90); with it the round matches the old dense
            # ladder while typical corpora keep the cheap sparse path.
            rank_b = _super_round(rank_b, base, m, mode, densify=False)
            base, m = s, 1
        # truncate EVERY round (forked-DAG rule): a two-round lineage
        # was measured 2-4x slower at sf0.1 — the joined rank tables
        # re-enter planning each round and the deferred plan replays
        pairs = iter_materialize(
            _span_probe(live, rank_b, base, m, s, small)
        )
        stat = pairs.agg(
            F.count("*").alias("n"), F.max("lcp").alias("m")
        ).collect()[0]
        n_live, bound = int(stat["n"]), max(bound, int(stat["m"] or 0))
        s //= 2
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
    # occurrence count from the ladder (see docstring): cover
    # [0, run_len) with base-b rank spans at offsets 0, b, ..., plus an
    # overlapping run_len - b tail; a suffix starts an occurrence iff
    # its rank_b agrees with the winner's at EVERY offset
    # (collision-free; the 0-sentinel keeps shorter suffixes on
    # distinct ranks). Probe count is bounded by the ladder stride.
    b = max(x for x in spans if x <= run_len)
    offs = list(range(0, run_len - b + 1, b))
    if offs[-1] != run_len - b:
        offs.append(run_len - b)
    rank_b = by_span[b]
    wr = {
        int(r["pos"]): r["r"]
        for r in rank_b.filter(
            (F.col("doc_id") == wd)
            & F.col("pos").isin([wp + o for o in offs])
        ).collect()
    }  # bounded: at most len(offs) rows
    cand = rank_b.filter(F.col("r") == F.lit(wr[wp])).select(
        "doc_id", "pos"
    )
    for o in offs[1:]:
        mo = rank_b.filter(F.col("r") == F.lit(wr[wp + o])).select(
            "doc_id", (F.col("pos") - o).alias("pos")
        )
        cand = cand.join(mo, ["doc_id", "pos"])
    n = cand.count()
    return spark.createDataFrame([(run_len, w["run"], int(n))], out_schema)
