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

Scale shape: each round is one self-join on (doc_id, pos + h) — an
equi shuffle join on the suffix key — plus ONE dense-rank assignment.
Dense rank is the classic global-funnel trap: a bare
``dense_rank() over (order by ...)`` is Exchange SinglePartition. The
``mode`` switch reuses the repo's gapless-id machinery (operators/
ids.py): rank the DISTINCT key frame (which shrinks every round) with
the two-pass range-partition scheme and join back — no single-partition
stage anywhere in 'distributed' mode; 'window' mode is the small-input
/gate form. Early exit when all ranks are unique (a one-scalar count —
a bounded control decision like the k-means shift probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def suffix_ranks(
    docs: DataFrame,
    tokens_expr: str = TOKENS_EXPR,
    mode: str = "window",
) -> DataFrame:
    """(doc_id, pos, rank): the lexicographic dense rank of every token
    suffix (pos is 0-based; equal suffixes — across documents too —
    share a rank). ``mode`` as in operators/ids.py."""
    toks = docs.select("doc_id", F.expr(tokens_expr).alias("toks"))
    suf = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    max_len = toks.agg(F.max(F.size("toks"))).collect()[0][0] or 0
    if max_len == 0:
        raise ValueError("empty corpus: no tokens to rank")
    cur = iter_materialize(
        _dense_ranks(suf, ["tok"], mode).select("doc_id", "pos", "r")
    )
    # no per-round all-unique probe: identical suffixes (ubiquitous in
    # real corpora — any shared final token) keep ranks tied forever,
    # so the probe is a wasted job per round; the loop is bounded by
    # ceil(log2(longest document)) regardless
    h = 1
    while h < max_len:
        nxt = cur.select(
            "doc_id", (F.col("pos") - h).alias("pos"), F.col("r").alias("r2")
        )
        keyed = (
            cur.join(nxt, ["doc_id", "pos"], "left")
            .select(
                "doc_id",
                "pos",
                F.col("r").alias("r1"),
                F.coalesce("r2", F.lit(0)).alias("r2"),
            )
        )
        cur = iter_materialize(
            _dense_ranks(keyed, ["r1", "r2"], mode).select(
                "doc_id", "pos", "r"
            )
        )
        h *= 2
    return cur.select("doc_id", "pos", F.col("r").alias("rank"))


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
    distinct, exactly like the 0 sentinel)."""
    toks = docs.select("doc_id", F.expr(tokens_expr).alias("toks"))
    suf = toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    max_len = toks.agg(F.max(F.size("toks"))).collect()[0][0] or 0
    if max_len == 0:
        raise ValueError("empty corpus: no tokens to rank")
    out_rows = []
    spark = docs.sparkSession
    cur = iter_materialize(
        _dense_ranks(suf, ["tok"], mode).select("doc_id", "pos", "r")
    )

    def profile(h: int, frame: DataFrame) -> None:
        g = frame.groupBy("r").agg(F.count("*").alias("c")).filter(
            F.col("c") > 1
        )
        row = g.agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("n_dup"),
            F.count("*").alias("n_groups"),
        ).collect()[0]
        out_rows.append((h, int(row["n_dup"]), int(row["n_groups"])))

    profile(1, cur)
    h = 1
    limit = max_h or max_len
    while h < limit and out_rows[-1][1] > 0:
        nxt = cur.select(
            "doc_id", (F.col("pos") - h).alias("pos"), F.col("r").alias("r2")
        )
        keyed = cur.join(nxt, ["doc_id", "pos"], "left").select(
            "doc_id",
            "pos",
            F.col("r").alias("r1"),
            F.coalesce("r2", F.lit(0)).alias("r2"),
        )
        cur = iter_materialize(
            _dense_ranks(keyed, ["r1", "r2"], mode).select(
                "doc_id", "pos", "r"
            )
        )
        h *= 2
        profile(h, cur)
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

    Shape: final suffix ranks (prefix doubling above), then
    - identical suffixes (same dense rank, group > 1): candidate run =
      the whole suffix;
    - adjacent DISTINCT ranks r, r+1: candidate run = token-level LCP
      of one representative of each (same-rank suffixes are identical,
      so any representative is exact) — computed in-row from the two
      sliced token arrays after ONE join back to the corpus.
    No window over the corpus: rank adjacency is the equi join
    r = r + 1, and representatives are a groupBy-min. ``n_occurrences``
    counts suffixes whose first run_len tokens equal the run."""
    toks = docs.select("doc_id", F.expr(tokens_expr).alias("toks"))
    ranks = suffix_ranks(docs, tokens_expr, mode)
    # suffix token arrays, fetched once — persisted: the representative
    # extraction, the within/adjacent candidate branches and the final
    # occurrence count all read this frame
    suf = ranks.join(toks, "doc_id").select(
        "rank",
        "doc_id",
        "pos",
        F.expr("slice(toks, pos + 1, size(toks) - pos)").alias("stoks"),
    ).persist()
    # one representative per rank (identical suffixes: any member)
    rep = (
        suf.groupBy("rank")
        .agg(
            F.count("*").alias("grp"),
            F.min(F.struct("doc_id", "pos")).alias("m"),
        )
        .join(
            suf.select("rank", "doc_id", "pos", "stoks"),
            ["rank"],
        )
        .filter(
            (F.col("m.doc_id") == F.col("doc_id"))
            & (F.col("m.pos") == F.col("pos"))
        )
        .select("rank", "grp", "stoks")
    ).persist()
    # within-rank duplicates: the whole suffix repeats
    within = rep.filter(F.col("grp") > 1).select(
        F.size("stoks").alias("run_len"),
        F.col("stoks").alias("run_toks"),
    )
    # adjacent distinct ranks: token-level LCP of the representatives
    nxt = rep.select(
        (F.col("rank") - 1).alias("rank"), F.col("stoks").alias("ntoks")
    )
    lcp = (
        rep.join(nxt, "rank")
        .select(
            F.expr(
                "CASE WHEN exists(zip_with(stoks, ntoks, (a, b) -> "
                "a IS DISTINCT FROM b), x -> x) THEN "
                "array_position(zip_with(stoks, ntoks, (a, b) -> "
                "a IS DISTINCT FROM b), true) - 1 "
                "ELSE least(size(stoks), size(ntoks)) END"
            ).cast("int").alias("run_len"),
            F.col("stoks").alias("run_toks"),
        )
        .filter(F.col("run_len") > 0)
    )
    cands = within.unionByName(lcp).select(
        "run_len",
        F.expr("concat_ws(' ', slice(run_toks, 1, run_len))").alias("run"),
    )
    best = cands.orderBy(F.col("run_len").desc(), F.col("run").asc()).limit(1)
    # occurrence count of the winning run
    n = (
        suf.crossJoin(F.broadcast(best))
        .filter(
            F.expr("concat_ws(' ', slice(stoks, 1, run_len))")
            == F.col("run")
        )
        .filter(F.size("stoks") >= F.col("run_len"))
        .agg(F.count("*").alias("n_occurrences"))
    )
    return best.crossJoin(F.broadcast(n)).select(
        "run_len", "run", "n_occurrences"
    )
