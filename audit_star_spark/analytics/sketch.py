"""Mergeable HyperLogLog distinct-count sketches (Flajolet et al. 2007;
the HLL practice write-up is Heule et al. 2013).

Spark's built-in ``approx_count_distinct`` is HLL too, but its sketch
state lives inside the aggregation buffer — it cannot be persisted,
merged across micro-batches, or cross-checked by another engine. This
module keeps the sketch in the DATA MODEL instead: a register is a row
``(group, idx, rho_max)``, so

- building is two hash aggregations (map-side combined);
- MERGING is just ``max`` grouped by (group, idx) — partial sketches
  from different batches/partitions/days combine exactly, which is what
  the streaming store (streaming/sketch.py) leans on;
- every value is deterministic integer math off md5 (the repo's
  cross-engine hash), so a DuckDB oracle reproduces the registers AND
  the estimate bit-for-bit — an auditable approximate count.

Register math (m = 256, b = 8): h = 60-bit md5-derived integer;
``idx = h % m``; the remaining 52-bit window ``w = h // m`` yields
``rho = 53 - length(bin(w))`` (leading zeros + 1; 53 when w = 0).
Estimator: ``alpha_m * m^2 / S`` with
``S = (m - n_hit) + sum(2^-rho_max)`` folded over the SORTED register
list (float addition is order-sensitive at the last ulp; sorted folds
are bit-stable on any engine at any parallelism — the char_entropy
recipe), with the standard linear-counting small-range correction
``m * ln(m / zeros)`` when ``est <= 2.5m`` and zeros remain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# standard error 1.04/sqrt(m) — the 4-sigma contract bound the gate uses
HLL_RSE = 1.04 / (HLL_M ** 0.5)


def _hash_expr(value_col: str) -> str:
    return (
        f"CAST(conv(substring(md5(CAST({value_col} AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )


def hll_partials(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Per group: the hit registers ``(keys..., idx, rho_max)`` — the
    mergeable sketch rows. Two map-side-combined hash aggregations; at
    most ``m`` rows per group survive regardless of input size."""
    h = F.expr(_hash_expr(value_col))
    staged = df.filter(F.col(value_col).isNotNull()).select(
        *keys,
        (h % HLL_M).alias("idx"),
        F.expr(
            f"CASE WHEN {_hash_expr(value_col)} div {HLL_M} = 0 THEN 53 "
            f"ELSE 53 - length(bin({_hash_expr(value_col)} div {HLL_M})) END"
        ).alias("rho"),
    )
    return staged.groupBy(*keys, "idx").agg(F.max("rho").alias("rho_max"))


def hll_merge(partials_a: DataFrame, partials_b: DataFrame) -> DataFrame:
    """Union two partial-sketch relations and re-maximize — the exact
    merge (HLL registers combine by max)."""
    keys = [c for c in partials_a.columns if c not in ("idx", "rho_max")]
    return (
        partials_a.unionByName(partials_b)
        .groupBy(*keys, "idx")
        .agg(F.max("rho_max").alias("rho_max"))
    )


def hll_estimate(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Partial-sketch rows -> (keys..., est_distinct double, n_hit,
    zeros). Deterministic: the 2^-rho mass folds over the sorted
    register list."""
    folded = partials.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_hit"),
        F.expr(
            "aggregate(array_sort(collect_list(rho_max)), CAST(0.0 AS DOUBLE),"
            " (s, r) -> s + pow(2.0, -r))"
        ).alias("hit_mass"),
    )
    m = float(HLL_M)
    s_col = (F.lit(m) - F.col("n_hit")) + F.col("hit_mass")
    raw = F.lit(HLL_ALPHA * m * m) / s_col
    zeros = (F.lit(HLL_M) - F.col("n_hit")).cast("long")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(m) * F.log(F.lit(m) / zeros.cast("double")),
    ).otherwise(raw)
    return folded.select(
        *keys,
        F.round(est, 6).alias("est_distinct"),
        "n_hit",
        zeros.alias("zeros"),
    )


def hll_distinct(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """One-shot grouped approximate distinct count (build + estimate)."""
    return hll_estimate(hll_partials(df, keys, value_col), keys)


def hll_sql(
    table: str, keys: Sequence[str], value_col: str
) -> str:
    """DuckDB mirror: identical register construction and sorted-fold
    estimator — the oracle reproduces the estimate bit-for-bit.
    ``keys`` may be empty (ungrouped), matching hll_partials(keys=[])."""
    ks = ", ".join(keys)
    kc = f"{ks}, " if keys else ""  # "k1, k2, " or "" — empty-keys guard
    gb = f" GROUP BY {ks}" if keys else ""
    h = (
        f"('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT"
    )
    m = float(HLL_M)
    return f"""
WITH hashed AS (
  SELECT {kc}{h} % {HLL_M} AS idx,
         CASE WHEN {h} // {HLL_M} = 0 THEN 53
              ELSE 53 - length(bin({h} // {HLL_M})) END AS rho
  FROM {table} WHERE {value_col} IS NOT NULL
),
regs AS (
  SELECT {kc}idx, MAX(rho) AS rho_max FROM hashed GROUP BY {kc}idx
),
folded AS (
  SELECT {kc}CAST(COUNT(*) AS BIGINT) AS n_hit,
         list_reduce(
           list_concat([CAST(0.0 AS DOUBLE)], list_sort(list(rho_max))),
           (s, r) -> s + pow(2.0, -r)) AS hit_mass
  FROM regs{gb}
)
SELECT {kc}
       round(CASE WHEN CAST({HLL_ALPHA * m * m!r} AS DOUBLE)
                         / ((CAST({m!r} AS DOUBLE) - n_hit) + hit_mass)
                       <= CAST({2.5 * m!r} AS DOUBLE)
                  AND {HLL_M} - n_hit > 0
             THEN CAST({m!r} AS DOUBLE)
                    * ln(CAST({m!r} AS DOUBLE) / ({HLL_M} - n_hit))
             ELSE CAST({HLL_ALPHA * m * m!r} AS DOUBLE)
                    / ((CAST({m!r} AS DOUBLE) - n_hit) + hit_mass)
             END, 6) AS est_distinct,
       n_hit,
       CAST({HLL_M} - n_hit AS BIGINT) AS zeros
FROM folded
"""


# ------------------------------------------------- KMV / theta sketches

KMV_K = 256
KMV_H = 1 << 60  # md5-derived hash space (15 hex chars)


def kmv_partials(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per group: the k smallest DISTINCT value hashes, sorted —
    (keys..., hs array<bigint>). A KMV (bottom-k) sketch: mergeable by
    union+re-truncate, and it answers set operations (union AND
    intersection) that HLL registers cannot.

    Scale shape: distinct (group, hash) rows first (one dedup shuffle),
    then a per-group bottom-k window — the sketch never buffers a
    group's full distinct set in one aggregation buffer."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.expr(_hash_expr(value_col))
    distinct = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        distinct.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("h")).alias("hs"))
    )


def kmv_merge_expr(a: str, b: str, k: int = KMV_K) -> F.Column:
    """In-row merge of two sketch arrays: union, dedup, re-truncate."""
    return F.expr(f"slice(array_sort(array_distinct(concat({a}, {b}))), 1, {k})")


def kmv_estimate_expr(hs: str, k: int = KMV_K) -> F.Column:
    """Distinct-count estimate from a sketch array: exact |hs| while the
    set fits (the sketch IS the distinct hash set, modulo md5
    collisions); otherwise the classic (k-1)/theta with
    theta = kth smallest / H."""
    return F.expr(
        f"CASE WHEN size({hs}) < {k} THEN CAST(size({hs}) AS DOUBLE) "
        f"ELSE ({k} - 1) * CAST({KMV_H} AS DOUBLE) / element_at({hs}, {k}) END"
    )


def kmv_intersection_expr(a: str, b: str, k: int = KMV_K) -> F.Column:
    """Theta-sketch intersection estimate: with theta the smaller
    sketch threshold, |A ∩ B ∩ [0, theta)| / theta — all in-row."""
    theta = (
        f"least(CASE WHEN size({a}) < {k} THEN CAST({KMV_H} AS DOUBLE) "
        f"ELSE CAST(element_at({a}, {k}) AS DOUBLE) END, "
        f"CASE WHEN size({b}) < {k} THEN CAST({KMV_H} AS DOUBLE) "
        f"ELSE CAST(element_at({b}, {k}) AS DOUBLE) END)"
    )
    inter = (
        f"size(filter(array_intersect({a}, {b}), x -> x < {theta}))"
    )
    return F.expr(f"{inter} * CAST({KMV_H} AS DOUBLE) / {theta}")


def kmv_sql_partials(
    table: str, keys: Sequence[str], value_col: str, k: int = KMV_K
) -> str:
    """DuckDB mirror of kmv_partials (bit-identical arrays). ``keys``
    may be empty (ungrouped), matching kmv_partials(keys=[])."""
    ks = ", ".join(keys)
    kc = f"{ks}, " if keys else ""  # empty-keys guard
    pb = f"PARTITION BY {ks} " if keys else ""
    gb = f" GROUP BY {ks}" if keys else ""
    h = f"('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT"
    return f"""
SELECT {kc}list_sort(list(h)) AS hs FROM (
  SELECT {kc}h, row_number() OVER ({pb}ORDER BY h) AS rn
  FROM (SELECT DISTINCT {kc}{h} AS h FROM {table}
        WHERE {value_col} IS NOT NULL)
) WHERE rn <= {k}{gb}
"""


# ------------------------------ HDR log-linear quantile sketches

HDR_SUB_BITS = 7
# Bucket-midpoint relative error bound: half the bucket width over the
# bucket's lower edge = 2^-(sub_bits+1) (~0.39% at sub_bits=7).


def _hdr_bucket_exprs(value_col: str, sub_bits: int) -> tuple[str, str]:
    """(e, sub) bucket coordinates for a non-negative BIGINT value.

    Log-linear (HdrHistogram-style) bucketing: ``e`` is the bit length
    of the value, ``sub`` its top ``sub_bits + 1`` bits — every
    operation is integer-exact, so unlike log-based DDSketch indices
    there is no float-``ln`` last-ulp boundary hazard between engines.
    Ordering by (e, sub) is value order: e is the bit length, and
    within one e the top bits order the values."""
    e = f"length(bin({value_col}))"
    shift = f"greatest({e} - {sub_bits + 1}, 0)"
    sub = f"shiftright({value_col}, cast({shift} as int))"
    return e, sub


def hdr_partials(
    df: DataFrame, keys: Sequence[str], value_col: str,
    sub_bits: int = HDR_SUB_BITS,
    weight_col: str | None = None,
) -> DataFrame:
    """Grouped mergeable quantile-sketch rows ``(keys..., e, sub,
    cnt)`` over a non-negative integer column (scale decimals to
    integer units — cents, micros — first; NULL and negative rows are
    dropped, mirrored by the SQL oracle).

    ``weight_col`` (non-negative INTEGER weights) turns the sketch into
    a WEIGHTED quantile sketch: a row counts ``weight`` times, so the
    rank walk answers e.g. token-weighted length percentiles — the
    quantile of the value an average TOKEN sits at, not an average
    document. Exact-integer weights keep the sketch hash-exact.

    One map-side-combined hash aggregation; at most
    ``64 * 2^sub_bits`` buckets per group survive regardless of input
    size. Merging partials is ``sum(cnt)`` grouped by the bucket —
    partial sketches from different batches/partitions/days combine
    exactly (the streaming store's contract)."""
    e, sub = _hdr_bucket_exprs(value_col, sub_bits)
    staged = df.filter(
        F.col(value_col).isNotNull() & (F.col(value_col) >= 0)
    )
    if weight_col is None:
        agg = F.count("*")
    else:
        staged = staged.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col) >= 0)
        )
        agg = F.sum(weight_col)
    return (
        staged.select(
            *keys,
            F.expr(e).alias("e"),
            F.expr(sub).alias("sub"),
            *([] if weight_col is None else [F.col(weight_col)]),
        )
        .groupBy(*keys, "e", "sub")
        .agg(agg.cast("long").alias("cnt"))
    )


def hdr_merge(partials_a: DataFrame, partials_b: DataFrame) -> DataFrame:
    """Union two partial-sketch relations and re-sum — the exact merge
    (bucket counts combine by addition)."""
    keys = [c for c in partials_a.columns if c not in ("cnt",)]
    return (
        partials_a.unionByName(partials_b)
        .groupBy(*keys)
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def hdr_quantiles(
    partials: DataFrame,
    keys: Sequence[str],
    qs: Sequence[float],
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Sketch rows -> one row per (group, q): ``(keys..., q, n, lo,
    hi, est)`` where [lo, hi] is the integer bucket holding the
    nearest-rank (rank = max(1, ceil(q*n)), 1-based) order statistic —
    so ``lo <= exact_disc_quantile <= hi`` ALWAYS, by construction —
    and est is the bucket midpoint (relative error <=
    2^-(sub_bits+1)).

    The rank walk is a cumulative-count window ordered by (e, sub)
    (= value order); buckets are unique per group so the cumsum is
    deterministic at any parallelism."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("e", "sub")
    wall = Window.partitionBy(*[F.col(k) for k in keys])
    shift = f"greatest(e - {sub_bits + 1}, 0)"
    cum = (
        partials.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(wall).cast("long"))
        .withColumn(
            "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
        )
        .withColumn(
            "rank",
            F.greatest(F.lit(1).cast("long"), F.expr("cast(ceil(q * n) as bigint)")),
        )
        .filter((F.col("cum") >= F.col("rank")) & (F.col("cum") - F.col("cnt") < F.col("rank")))
    )
    lo = F.expr(f"shiftleft(sub, cast({shift} as int))")
    hi = F.expr(f"shiftleft(sub + 1, cast({shift} as int)) - 1")
    return cum.select(
        *keys,
        "q",
        "n",
        lo.alias("lo"),
        hi.alias("hi"),
        F.round((lo + hi) / F.lit(2.0), 6).alias("est"),
    )


def hdr_sql(
    table: str,
    keys: Sequence[str],
    value_expr: str,
    qs: Sequence[float],
    sub_bits: int = HDR_SUB_BITS,
    weight_expr: str | None = None,
) -> str:
    """DuckDB mirror of hdr_partials + hdr_quantiles — identical
    integer bucket math and rank walk, so lo/hi/est hash-match
    bit-for-bit. ``weight_expr`` mirrors the weighted variant."""
    ks = ", ".join(keys)
    kc = f"{ks}, " if keys else ""  # empty-keys guard (ungrouped)
    pb = f"PARTITION BY {ks} " if keys else ""
    e = "length(bin(v))"
    shift = f"greatest({e} - {sub_bits + 1}, 0)"
    qlist = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    if weight_expr is None:
        w_sel, w_filter, agg = "", "", "COUNT(*)"
    else:
        w_sel = f", {weight_expr} AS wt"
        w_filter = f" AND {weight_expr} IS NOT NULL AND {weight_expr} >= 0"
        agg = "SUM(wt)"
    return f"""
WITH vals AS (
  SELECT {kc}{value_expr} AS v{w_sel} FROM {table}
  WHERE {value_expr} IS NOT NULL AND {value_expr} >= 0{w_filter}
),
buckets AS (
  SELECT {kc}{e} AS e, (v >> CAST({shift} AS INTEGER)) AS sub,
         CAST({agg} AS BIGINT) AS cnt
  FROM vals GROUP BY {kc}e, sub
),
walked AS (
  SELECT {kc}e, sub, cnt,
         SUM(cnt) OVER ({pb}ORDER BY e, sub) AS cum,
         CAST(SUM(cnt) OVER ({pb.strip() or ''}) AS BIGINT) AS n
  FROM buckets
),
picked AS (
  SELECT w.*, q.q,
         GREATEST(1, CAST(ceil(q.q * w.n) AS BIGINT)) AS rnk
  FROM walked w CROSS JOIN (SELECT UNNEST([{qlist}]) AS q) q
)
SELECT {kc}q, n,
       (sub << CAST(GREATEST(e - {sub_bits + 1}, 0) AS INTEGER)) AS lo,
       ((sub + 1) << CAST(GREATEST(e - {sub_bits + 1}, 0) AS INTEGER)) - 1 AS hi,
       round(((sub << CAST(GREATEST(e - {sub_bits + 1}, 0) AS INTEGER))
              + ((sub + 1) << CAST(GREATEST(e - {sub_bits + 1}, 0) AS INTEGER)) - 1)
             / CAST(2.0 AS DOUBLE), 6) AS est
FROM picked
WHERE cum >= rnk AND cum - cnt < rnk
"""


# ------------------------------------------- Count-Min frequency sketch

CMS_W = 256
CMS_D = 3


def cms_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> DataFrame:
    """Count-Min sketch rows (Cormode & Muthukrishnan 2005) per group:
    ``(keys..., i, j, cnt)`` — d seeded hash rows of w counters, each
    input value incrementing one cell per row. At most ``d * w`` rows
    per group survive regardless of input size; partial sketches merge
    by ``sum(cnt)`` (the streaming-store law). Every cell index is the
    repo's seeded md5 integer hash — a SQL oracle reproduces the whole
    counter table, and therefore every estimate, exactly."""
    rows = []
    for i in range(d):
        h = (
            f"CAST(conv(substring(md5(concat(CAST({value_col} AS STRING), "
            f"'#', '{i}')), 1, 15), 16, 10) AS BIGINT)"
        )
        rows.append(f"named_struct('i', {i}, 'j', CAST({h} % {w} AS INT))")
    cells = F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("cell")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, cells)
        .select(*keys, F.col("cell.i").alias("i"), F.col("cell.j").alias("j"))
        .groupBy(*keys, "i", "j")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(partials_a: DataFrame, partials_b: DataFrame) -> DataFrame:
    """Union + re-sum: the exact merge (counters combine by addition)."""
    keys = [c for c in partials_a.columns if c != "cnt"]
    return (
        partials_a.unionByName(partials_b)
        .groupBy(*keys)
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_estimate(
    partials: DataFrame,
    probes: DataFrame,
    keys: Sequence[str],
    probe_col: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> DataFrame:
    """Point-frequency estimates for ``probes`` (one row per (group,
    probe value)): ``est = min_i cnt[i][hash_i(v)]`` with absent cells
    counting 0. The classic CMS contract — ``est >= true count``,
    ALWAYS — holds by construction (cells only over-count).

    Plan shape: the probe side explodes to d rows, left-joins the
    sketch cells on (group, i, j), and min-aggregates — a broadcast-
    friendly join against at most ``groups * d * w`` sketch rows."""
    rows = []
    for i in range(d):
        h = (
            f"CAST(conv(substring(md5(concat(CAST({probe_col} AS STRING), "
            f"'#', '{i}')), 1, 15), 16, 10) AS BIGINT)"
        )
        rows.append(f"named_struct('i', {i}, 'j', CAST({h} % {w} AS INT))")
    cells = F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("cell")
    probe_cells = probes.select(
        *keys,
        F.col(probe_col),
        cells,
    ).select(
        *keys, probe_col, F.col("cell.i").alias("i"), F.col("cell.j").alias("j")
    )
    joined = probe_cells.join(partials, [*keys, "i", "j"], "left")
    return joined.groupBy(*keys, probe_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
    )


def cms_sql(
    table: str,
    keys: Sequence[str],
    value_col: str,
    probes_sql: str,
    probe_col: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> str:
    """DuckDB mirror of cms_partials + cms_estimate over a probe
    relation — identical cells, identical mins."""
    ks = ", ".join(keys)
    kj = " AND ".join(f"s.{k} = p.{k}" for k in keys) or "TRUE"
    kp = ", ".join(f"p.{k}" for k in keys)
    sel_keys = (kp + ", ") if keys else ""

    def h(col: str, i: str) -> str:
        return (
            f"('0x' || substr(md5(CAST({col} AS VARCHAR) || '#' || "
            f"CAST({i} AS VARCHAR)), 1, 15))::BIGINT"
        )

    return f"""
WITH cells AS (
  SELECT {ks}{',' if keys else ''} i, ({h(value_col, 'i')}) % {w} AS j,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} CROSS JOIN (SELECT UNNEST(range({d})) AS i)
  WHERE {value_col} IS NOT NULL
  GROUP BY ALL
),
probe_cells AS (
  SELECT p.*, q.i, ({h(f'p.{probe_col}', 'q.i')}) % {w} AS j
  FROM ({probes_sql}) p CROSS JOIN (SELECT UNNEST(range({d})) AS q_i) q(i)
)
SELECT {sel_keys}p.{probe_col},
       CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est
FROM probe_cells p LEFT JOIN cells s
  ON {kj} AND s.i = p.i AND s.j = p.j
GROUP BY {sel_keys}p.{probe_col}
"""


def kmv_difference_expr(a: str, b: str, k: int = KMV_K) -> F.Column:
    """Theta-sketch set-difference estimate |A \\ B|: with theta the
    smaller sketch threshold, count A's sub-theta hashes NOT in B,
    scaled by 1/theta — completing the union/intersection/difference
    theta algebra, all in-row."""
    theta = (
        f"least(CASE WHEN size({a}) < {k} THEN CAST({KMV_H} AS DOUBLE) "
        f"ELSE CAST(element_at({a}, {k}) AS DOUBLE) END, "
        f"CASE WHEN size({b}) < {k} THEN CAST({KMV_H} AS DOUBLE) "
        f"ELSE CAST(element_at({b}, {k}) AS DOUBLE) END)"
    )
    only_a = (
        f"size(filter(array_except({a}, {b}), x -> x < {theta}))"
    )
    return F.expr(f"{only_a} * CAST({KMV_H} AS DOUBLE) / {theta}")


def cms_join_size_estimate(
    partials_a: DataFrame,
    partials_b: DataFrame,
    keys: Sequence[str],
    w: int = CMS_W,
    d: int = CMS_D,
) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches over
    the join key (Cormode & Muthukrishnan 2005, §4.2 inner-product
    estimation): per hash row i, ``sum_j a[i][j] * b[i][j]`` OVERCOUNTS
    |A ⋈ B| (colliding keys multiply), so the min over rows is a
    one-sided estimate — ``est >= true join size``, always.

    This is the scale use of CMS: decide whether a join output will
    explode BEFORE running it, from two sketch tables of at most
    ``d * w`` rows each per group. Returns (keys..., est_join_size).

    A hash row with NO colliding (i, j) cells has inner product 0 and
    must bound the min (disjoint inputs estimate 0, not "no row"), so
    the products are re-attached to a generated (group, i) spine with
    ``coalesce(ip, 0)`` — groups present in either sketch get a row."""
    spark = partials_a.sparkSession
    a = partials_a.select(*keys, "i", "j", F.col("cnt").alias("cnt_a"))
    b = partials_b.select(*keys, "i", "j", F.col("cnt").alias("cnt_b"))
    prods = a.join(b, [*keys, "i", "j"]).select(
        *keys, "i", (F.col("cnt_a") * F.col("cnt_b")).alias("p")
    )
    hits = prods.groupBy(*keys, "i").agg(
        F.sum("p").cast("long").alias("ip")
    )
    ivals = spark.range(d).select(F.col("id").cast("int").alias("i"))
    if keys:
        groups = (
            partials_a.select(*keys)
            .unionByName(partials_b.select(*keys))
            .distinct()
        )
        spine = groups.crossJoin(ivals)  # |groups| * d rows — tiny
    else:
        spine = ivals
    per_row = spine.join(hits, [*keys, "i"], "left").select(
        *keys, "i", F.coalesce(F.col("ip"), F.lit(0)).cast("long").alias("ip")
    )
    return per_row.groupBy(*keys).agg(
        F.min("ip").cast("long").alias("est_join_size")
    )


def cms_join_size_sql(
    table_a: str,
    key_a: str,
    table_b: str,
    key_b: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> str:
    """DuckDB mirror of ungrouped cms_partials x2 + inner-product min
    (integer-exact, so the estimate hash-matches)."""

    def cells(table: str, col: str) -> str:
        h = (
            f"('0x' || substr(md5(CAST({col} AS VARCHAR) || '#' || "
            f"CAST(i AS VARCHAR)), 1, 15))::BIGINT"
        )
        return f"""
  SELECT i, ({h}) % {w} AS j, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} CROSS JOIN (SELECT UNNEST(range({d})) AS i)
  WHERE {col} IS NOT NULL
  GROUP BY 1, 2
"""

    return f"""
WITH ca AS ({cells(table_a, key_a)}),
cb AS ({cells(table_b, key_b)}),
spine AS (SELECT UNNEST(range({d})) AS i),
per_row AS (
  SELECT s.i, CAST(COALESCE(SUM(ca.cnt * cb.cnt), 0) AS BIGINT) AS ip
  FROM spine s
  LEFT JOIN ca ON ca.i = s.i
  LEFT JOIN cb ON cb.i = ca.i AND cb.j = ca.j
  GROUP BY s.i
)
SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM per_row
"""
