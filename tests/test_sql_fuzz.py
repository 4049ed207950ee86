"""Seeded SQL conformance fuzzer: generate random (but deterministic)
ANSI-SQL queries in the Spark ∩ DuckDB dialect subset and require both
engines to return IDENTICAL results on the same testdata — a
sqllogictest-style differential corpus the reference never had
(SURVEY.md §5: "no sqllogictest corpus").

The generator sticks to constructs with engine-exact semantics: integer
sums (CAST to BIGINT — DuckDB widens to HUGEINT), exact comparisons,
COUNT/COUNT DISTINCT, MIN/MAX (order-free), timestamp literals, LIKE,
modulo, IN lists, equi-joins, HAVING. Float SUM/AVG are deliberately
excluded (summation order differs by partitioning; the curated gate
queries handle those with integer-cents algebra)."""

import random

import pytest

from audit_star_spark.testing import duckdb_connection, compare
from tests.conftest import SF_DIR

SEED = 20240814
N_PER_SHAPE = 80

_AGGS = [
    "CAST(COUNT(*) AS BIGINT)",
    "CAST(COUNT(DISTINCT o_custkey) AS BIGINT)",
    "CAST(SUM(o_orderkey) AS BIGINT)",
    "MIN(o_totalprice)",
    "MAX(o_totalprice)",
    "CAST(MIN(o_orderdate) AS TIMESTAMP)",
    "CAST(MAX(o_orderdate) AS TIMESTAMP)",
]


def _pred(rng: random.Random) -> str:
    kind = rng.randrange(5)
    if kind == 0:
        return (
            f"o_totalprice {rng.choice(['<', '<=', '>', '>='])} "
            f"{rng.randint(1000, 500000)}"
        )
    if kind == 1:
        return f"o_custkey % {rng.randint(2, 13)} = {rng.randint(0, 1)}"
    if kind == 2:
        vals = rng.sample(["'O'", "'F'", "'P'"], rng.randint(1, 2))
        return f"o_orderstatus IN ({', '.join(vals)})"
    if kind == 3:
        return (
            f"o_orderdate >= TIMESTAMP '199{rng.randint(5, 8)}-"
            f"0{rng.randint(1, 9)}-01 00:00:00'"
        )
    return f"o_orderpriority LIKE '{rng.randint(1, 5)}%'"


def _where(rng: random.Random) -> str:
    n = rng.randrange(3)
    if n == 0:
        return ""
    glue = rng.choice([" AND ", " OR "])
    return " WHERE " + glue.join(_pred(rng) for _ in range(n))


def _gen_groupby(rng: random.Random) -> str:
    groups = rng.sample(
        ["o_orderstatus", "o_orderpriority"], rng.randrange(3)
    )
    aggs = [
        f"{a} AS a{i}"
        for i, a in enumerate(rng.sample(_AGGS, rng.randint(1, 4)))
    ]
    sel = ", ".join(groups + aggs)
    q = f"SELECT {sel} FROM orders{_where(rng)}"
    if groups:
        q += f" GROUP BY {', '.join(groups)}"
        if rng.random() < 0.3:
            q += f" HAVING COUNT(*) > {rng.randint(1, 5)}"
    return q


def _gen_join(rng: random.Random) -> str:
    aggs = [
        f"{a} AS a{i}"
        for i, a in enumerate(rng.sample(_AGGS[:5], rng.randint(1, 3)))
    ]
    q = (
        f"SELECT c_mktsegment, {', '.join(aggs)} "
        f"FROM orders JOIN customer ON o_custkey = c_custkey"
        f"{_where(rng)} GROUP BY c_mktsegment"
    )
    return q


def _gen_window(rng: random.Random) -> str:
    """Grouped top-k via ROW_NUMBER — deterministic because the ORDER BY
    always ends with the unique o_orderkey tie-break."""
    part = rng.choice(["o_orderstatus", "o_orderpriority"])
    order = rng.choice(
        ["o_totalprice DESC, o_orderkey", "o_orderdate, o_orderkey", "o_orderkey"]
    )
    k = rng.randint(1, 5)
    return (
        f"SELECT {part}, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn "
        f"FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {part} "
        f"ORDER BY {order}) AS rn FROM orders{_where(rng)}) t "
        f"WHERE rn <= {k}"
    )


def _gen_events(rng: random.Random) -> str:
    """Event-time bucketing: date_trunc + exact aggregates over the
    events table (the timestamp-heavy dialect corner)."""
    unit = rng.choice(["day", "hour"])
    preds = []
    if rng.random() < 0.5:
        vals = rng.sample(
            ["'click'", "'view'", "'purchase'", "'signup'", "'error'"],
            rng.randint(1, 3),
        )
        preds.append(f"event_type IN ({', '.join(vals)})")
    if rng.random() < 0.5:
        preds.append(f"user_id % {rng.randint(2, 9)} = {rng.randint(0, 1)}")
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    return (
        f"SELECT CAST(date_trunc('{unit}', ts) AS TIMESTAMP) AS b, event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS a0, "
        f"CAST(COUNT(DISTINCT user_id) AS BIGINT) AS a1 "
        f"FROM events{where} GROUP BY 1, 2"
    )


_CENTS = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _gen_lineitem(rng: random.Random) -> str:
    """Exact money sums via the integer-cents idiom (dialect-common), the
    same algebra the curated queries use for float columns."""
    preds = [f"l_quantity {rng.choice(['<', '>='])} {rng.randint(10, 40)}"]
    if rng.random() < 0.5:
        preds.append(f"l_returnflag = '{rng.choice(['A', 'N', 'R'])}'")
    return (
        f"SELECT l_returnflag, l_linestatus, "
        f"CAST(SUM({_CENTS}) AS BIGINT) AS cents, "
        f"CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM lineitem WHERE {' AND '.join(preds)} "
        f"GROUP BY l_returnflag, l_linestatus"
    )


def _gen_orderby_limit(rng: random.Random) -> str:
    """ORDER BY + LIMIT — deterministic because the sort always ends with
    the unique o_orderkey tie-break, so both engines must return the
    identical row SET (compare() is order-insensitive; the tie-break is
    what makes the limited set well-defined)."""
    order = rng.choice(
        [
            "o_totalprice DESC, o_orderkey",
            "o_totalprice, o_orderkey",
            "o_orderdate DESC, o_orderkey",
            "o_orderkey DESC",
        ]
    )
    k = rng.randint(1, 50)
    return (
        f"SELECT o_orderkey, o_orderstatus, o_totalprice "
        f"FROM orders{_where(rng)} ORDER BY {order} LIMIT {k}"
    )


def _gen_setop(rng: random.Random) -> str:
    """UNION / UNION ALL / EXCEPT / INTERSECT of two filtered projections
    — both engines treat bare EXCEPT/INTERSECT as DISTINCT variants."""
    op = rng.choice(["UNION", "UNION ALL", "EXCEPT", "INTERSECT"])
    col = rng.choice(["o_custkey", "o_orderkey % 1000", "o_orderstatus"])
    return (
        f"SELECT {col} AS v FROM orders WHERE {_pred(rng)} "
        f"{op} "
        f"SELECT {col} AS v FROM orders WHERE {_pred(rng)}"
    )


def _gen_outer_join(rng: random.Random) -> str:
    """LEFT OUTER join with a filtered inner side: NULL-extended rows are
    exactly where COUNT(*) and COUNT(column) diverge between dialects if
    either engine mishandles them."""
    q = (
        f"SELECT c_mktsegment, "
        f"CAST(COUNT(*) AS BIGINT) AS n_all, "
        f"CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_matched, "
        f"CAST(SUM(o.o_orderkey) AS BIGINT) AS s "
        f"FROM customer LEFT JOIN "
        f"(SELECT * FROM orders WHERE {_pred(rng)}) o "
        f"ON o.o_custkey = c_custkey "
        f"GROUP BY c_mktsegment"
    )
    return q


def _gen_scalar_subquery(rng: random.Random) -> str:
    """Uncorrelated scalar subqueries in WHERE — anchored on exact
    MIN/MAX scalars (never float AVG, whose summation order differs)."""
    frac = rng.choice(["0.25", "0.5", "0.75"])
    anchor = rng.choice(
        [
            f"{frac} * (SELECT MAX(o_totalprice) FROM orders)",
            f"(SELECT MIN(o_totalprice) FROM orders) + {rng.randint(1000, 90000)}",
        ]
    )
    groups = rng.choice(["o_orderstatus", "o_orderpriority"])
    return (
        f"SELECT {groups}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(o_orderkey) AS BIGINT) AS s "
        f"FROM orders WHERE o_totalprice > {anchor} "
        f"GROUP BY {groups}"
    )


def _gen_exists(rng: random.Random) -> str:
    """Correlated EXISTS / NOT EXISTS — the semi/anti-join shape (Q4/Q21
    family); the inner predicate keeps the correlation on the equi-key."""
    neg = rng.choice(["", "NOT "])
    inner_pred = rng.choice(
        [
            f"l_quantity >= {rng.randint(20, 45)}",
            f"l_returnflag = '{rng.choice(['A', 'N', 'R'])}'",
            "l_discount > 0.05",
        ]
    )
    return (
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(o_orderkey) AS BIGINT) AS s "
        f"FROM orders WHERE {neg}EXISTS ("
        f"SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND {inner_pred}) "
        f"GROUP BY o_orderstatus"
    )


def _gen_range_window(rng: random.Random) -> str:
    """RANGE-frame windows over event time: interval frames include
    peers, so the result is deterministic without a unique tie-break —
    exactly where ROWS/RANGE confusion bugs diverge."""
    hours = rng.randint(1, 48)
    part = rng.choice(["event_type", ""])
    part_sql = f"PARTITION BY {part} " if part else ""
    cols = "event_type, " if part else ""
    return (
        f"SELECT {cols}ts, CAST(cnt AS BIGINT) AS cnt FROM ("
        f"SELECT {cols.rstrip()} ts, COUNT(*) OVER ({part_sql}ORDER BY ts "
        f"RANGE BETWEEN INTERVAL {hours} HOURS PRECEDING AND CURRENT ROW) AS cnt "
        f"FROM events WHERE user_id % {rng.randint(3, 9)} = 0) t"
    )


def _gen_grouping_sets(rng: random.Random) -> str:
    """GROUPING SETS / ROLLUP / CUBE with a GROUPING() marker — the
    Expand-operator family; NULL group markers must align across
    engines.

    Documented divergence this shape SURFACED (fuzz_308/310, r4): over
    an EMPTY input, DuckDB emits the SQL-standard grand-total row for
    the () grouping set (count 0), Spark emits zero rows. The corpus
    normalizes with HAVING COUNT(*) > 0, which is identity on non-empty
    groups and erases the divergent empty-input row on both engines."""
    op = rng.choice(
        [
            "GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
            "ROLLUP (o_orderstatus, o_orderpriority)",
            "CUBE (o_orderstatus, o_orderpriority)",
        ]
    )
    return (
        f"SELECT o_orderstatus, o_orderpriority, "
        f"CAST(GROUPING(o_orderstatus) AS BIGINT) AS g1, "
        f"CAST(GROUPING(o_orderpriority) AS BIGINT) AS g2, "
        f"CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS s "
        f"FROM orders{_where(rng)} GROUP BY {op} HAVING COUNT(*) > 0"
    )


def _gen_string_funcs(rng: random.Random) -> str:
    """String-function algebra in the common dialect: substr (1-based),
    upper/lower, length, concat via ||, trim, replace — grouped so the
    result set stays small and exact."""
    exprs = rng.sample(
        [
            "upper(substr(o_orderpriority, 1, 3))",
            "lower(o_orderstatus)",
            "CAST(length(o_orderpriority) AS BIGINT)",
            "o_orderstatus || '-' || substr(o_orderpriority, 1, 1)",
            "replace(o_orderpriority, '-', '_')",
            "trim(o_orderpriority)",
            "substr(o_orderpriority, 2)",
        ],
        rng.randint(1, 3),
    )
    sel = ", ".join(f"{e} AS e{i}" for i, e in enumerate(exprs))
    return (
        f"SELECT {sel}, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders{_where(rng)} GROUP BY {', '.join(str(i + 1) for i in range(len(exprs)))}"
    )


def _gen_datetime(rng: random.Random) -> str:
    """Timestamp algebra in the common dialect: date_trunc buckets and
    EXTRACT fields over o_orderdate, grouped. Sticks to engine-exact
    constructs (no date +- interval arithmetic — Spark returns DATE
    where DuckDB returns TIMESTAMP for some forms)."""
    field = rng.choice(["year", "month", "quarter"])
    exprs = rng.sample(
        [
            f"CAST(date_trunc('{field}', o_orderdate) AS TIMESTAMP)",
            "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)",
            "CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)",
            "CAST(EXTRACT(day FROM o_orderdate) AS BIGINT)",
            "CAST(EXTRACT(hour FROM o_orderdate) AS BIGINT)",
        ],
        rng.randint(1, 2),
    )
    sel = ", ".join(f"{e} AS d{i}" for i, e in enumerate(exprs))
    agg = rng.choice(_AGGS)
    return (
        f"SELECT {sel}, {agg} AS a FROM orders{_where(rng)} "
        f"GROUP BY {', '.join(str(i + 1) for i in range(len(exprs)))}"
    )


def _gen_having_distinct(rng: random.Random) -> str:
    """GROUP BY ... HAVING over aggregate predicates mixed with DISTINCT
    aggregates — the post-aggregation filter path both planners rewrite
    differently (Spark: Filter above Aggregate; DuckDB: HAVING clause
    node), results must still agree exactly."""
    key = rng.choice(["o_orderstatus", "o_orderpriority", "o_custkey % 23"])
    aggs = rng.sample(
        [
            "CAST(COUNT(*) AS BIGINT)",
            "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)",
            "CAST(SUM(DISTINCT o_custkey % 101) AS BIGINT)",
            "MIN(o_totalprice)",
        ],
        rng.randint(1, 2),
    )
    sel = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
    having = rng.choice(
        [
            f"COUNT(*) > {rng.randint(1, 2000)}",
            f"COUNT(DISTINCT o_custkey) >= {rng.randint(2, 50)}",
            f"MIN(o_totalprice) < {rng.randint(5000, 100000)}",
        ]
    )
    return (
        f"SELECT {key} AS k, {sel} FROM orders{_where(rng)} "
        f"GROUP BY 1 HAVING {having}"
    )


def _gen_in_subquery(rng: random.Random) -> str:
    """[NOT] IN (SELECT ...) membership subqueries — the semi/anti-join
    rewrite path. Subquery sides stay NULL-free (key columns), keeping
    NOT IN's three-valued logic out of play, which is exactly how the
    curated queries use it too."""
    seg = rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"])
    sub = rng.choice(
        [
            f"SELECT c_custkey FROM customer WHERE c_mktsegment = '{seg}'",
            f"SELECT c_custkey FROM customer WHERE c_acctbal > {rng.randint(0, 5000)}",
            f"SELECT c_custkey FROM customer WHERE c_nationkey % {rng.randint(2, 7)} = 0",
        ]
    )
    neg = rng.choice(["", "NOT "])
    agg = rng.choice(_AGGS)
    return (
        f"SELECT o_orderstatus AS k, {agg} AS a FROM orders "
        f"WHERE o_custkey {neg}IN ({sub}) GROUP BY 1"
    )


def _gen_correlated_scalar_select(rng: random.Random) -> str:
    """Correlated scalar subqueries in the SELECT list (the per-row
    lookup shape Spark rewrites into a left outer aggregate join):
    COUNT/MIN over lineitem correlated on the equi-key. ORDER BY the
    unique key + LIMIT keeps the row set bounded and deterministic."""
    inner_pred = rng.choice(
        [
            f"l_quantity >= {rng.randint(5, 45)}",
            f"l_returnflag = '{rng.choice(['A', 'N', 'R'])}'",
            f"l_linenumber <= {rng.randint(1, 5)}",
        ]
    )
    second = rng.choice(
        [
            "(SELECT MIN(l_quantity) FROM lineitem "
            "WHERE l_orderkey = o_orderkey) AS min_qty",
            "(SELECT CAST(MAX(l_linenumber) AS BIGINT) FROM lineitem "
            "WHERE l_orderkey = o_orderkey) AS max_line",
        ]
    )
    return (
        f"SELECT o_orderkey, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem "
        f"WHERE l_orderkey = o_orderkey AND {inner_pred}) AS n_match, "
        f"{second} "
        f"FROM orders{_where(rng)} "
        f"ORDER BY o_orderkey LIMIT {rng.randint(20, 60)}"
    )


def _gen_chained_cte(rng: random.Random) -> str:
    """Chained CTEs: each WITH member references the previous one
    (filter -> aggregate -> post-filter/join-back), the staged-pipeline
    shape real analytics SQL takes."""
    k = rng.randint(2, 9)
    thresh = rng.randint(2, 30)
    tail = rng.choice(
        [
            "SELECT g, n, s FROM big",
            "SELECT b.g, b.n, a.total FROM big b JOIN "
            "(SELECT CAST(SUM(n) AS BIGINT) AS total FROM agg) a ON TRUE",
        ]
    )
    return (
        f"WITH base AS (SELECT o_orderstatus AS g, o_orderkey, o_custkey "
        f"FROM orders{_where(rng)}), "
        f"agg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(o_orderkey % {k}) AS BIGINT) AS s FROM base GROUP BY g), "
        f"big AS (SELECT g, n, s FROM agg WHERE n >= {thresh}) "
        f"{tail}"
    )


def _gen_filter_agg(rng: random.Random) -> str:
    """FILTER-clause aggregates: per-group conditional COUNT/SUM/MIN —
    the pivot-free conditional-aggregation shape. An empty FILTER set
    must yield NULL (MIN) / 0 (COUNT) identically in both engines."""
    cut = rng.randint(1000, 400000)
    k = rng.randint(2, 11)
    groups = rng.choice(["o_orderstatus", "o_orderpriority"])
    return (
        f"SELECT {groups}, "
        f"CAST(COUNT(*) FILTER (WHERE o_totalprice > {cut}) AS BIGINT) AS n_big, "
        f"CAST(SUM(o_orderkey) FILTER (WHERE o_custkey % {k} = 0) AS BIGINT) AS s_mod, "
        f"MIN(o_totalprice) FILTER (WHERE o_orderpriority LIKE '{rng.randint(1, 5)}%') AS m_pri "
        f"FROM orders{_where(rng)} "
        f"GROUP BY {groups}"
    )


def _gen_lateral(rng: random.Random) -> str:
    """LATERAL correlated derived tables — the per-row subrelation shape
    (Spark >= 3.2 lateral subquery, DuckDB LATERAL)."""
    inner_pred = rng.choice(
        [
            f"l_linenumber <= {rng.randint(1, 6)}",
            f"l_quantity >= {rng.randint(5, 40)}",
            f"l_returnflag = '{rng.choice(['A', 'N', 'R'])}'",
        ]
    )
    agg = rng.choice(
        ["MAX(l_quantity) AS m", "MIN(l_quantity) AS m",
         "CAST(MAX(l_linenumber) AS BIGINT) AS m"]
    )
    return (
        f"SELECT o_orderkey, t.n, t.m FROM orders, "
        f"LATERAL (SELECT CAST(COUNT(*) AS BIGINT) AS n, {agg} "
        f"FROM lineitem WHERE l_orderkey = o_orderkey AND {inner_pred}) t"
        f"{_where(rng)} "
        f"ORDER BY o_orderkey LIMIT {rng.randint(20, 50)}"
    )


def _gen_not_in_null(rng: random.Random) -> str:
    """NOT IN against a subquery that CONTAINS NULLs — the classic
    three-valued-logic trap (one NULL in the list makes NOT IN return
    no rows for non-matching values; both engines are ANSI here).
    NULLIF injects the NULLs deterministically."""
    mod = rng.randint(20, 60)
    nullable = f"NULLIF(c_custkey % {mod}, {rng.randint(0, 3)})"
    inner_where = f" WHERE c_custkey % {rng.randint(2, 5)} = 0" if rng.random() < 0.5 else ""
    op = rng.choice(["NOT IN", "IN"])
    return (
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders WHERE o_custkey % {mod} {op} "
        f"(SELECT {nullable} FROM customer{inner_where}) "
        f"GROUP BY o_orderstatus"
    )


def _gen_rows_frame(rng: random.Random) -> str:
    """Running / sliding integer sums over an explicit ROWS frame —
    deterministic because the window order ends on the unique
    o_orderkey and the sums are integer."""
    part = rng.choice(["o_orderstatus", "o_orderpriority", ""])
    over_part = f"PARTITION BY {part} " if part else ""
    frame = rng.choice(
        [
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {rng.randint(1, 4)} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN CURRENT ROW AND {rng.randint(1, 3)} FOLLOWING",
        ]
    )
    return (
        f"SELECT o_orderkey, "
        f"CAST(SUM(o_custkey) OVER ({over_part}ORDER BY o_orderkey {frame}) "
        f"AS BIGINT) AS running, "
        f"CAST(COUNT(*) OVER ({over_part}ORDER BY o_orderkey {frame}) "
        f"AS BIGINT) AS frame_n "
        f"FROM orders{_where(rng)} "
        f"ORDER BY o_orderkey LIMIT {rng.randint(30, 80)}"
    )


def _gen_theta_self_join(rng: random.Random) -> str:
    """Self-join with an inequality (theta) term next to the equi key —
    same-customer order pairs, canonical o1 < o2 ordering."""
    extra = rng.choice(
        [
            "",
            " AND o1.o_orderstatus = o2.o_orderstatus",
            " AND o1.o_totalprice < o2.o_totalprice",
        ]
    )
    return (
        f"SELECT o1.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        f"CAST(SUM(o1.o_orderkey + o2.o_orderkey) AS BIGINT) AS key_sum "
        f"FROM orders o1 JOIN orders o2 "
        f"ON o1.o_custkey = o2.o_custkey "
        f"AND o1.o_orderkey < o2.o_orderkey{extra} "
        f"WHERE o1.o_custkey % {rng.randint(2, 7)} = 0 "
        f"GROUP BY o1.o_orderstatus"
    )


def _gen_conditional_pivot(rng: random.Random) -> str:
    """Pivot-by-CASE conditional aggregation — one output column per
    status value, integer sums only (the manual-pivot shape reports are
    built from; engine-exact because every branch is integer)."""
    k = rng.randint(2, 9)
    groups = rng.choice(["o_orderpriority", f"o_custkey % {k}"])
    cols = ", ".join(
        f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{s.lower()}"
        for s in ("O", "F", "P")
    )
    return (
        f"SELECT {groups} AS g, {cols}, "
        f"CAST(SUM(CASE WHEN o_totalprice > {rng.randint(1000, 300000)} "
        f"THEN o_orderkey ELSE 0 END) AS BIGINT) AS s_big "
        f"FROM orders{_where(rng)} GROUP BY 1"
    )


def _gen_full_outer_coalesce(rng: random.Random) -> str:
    """FULL OUTER JOIN of two aggregates with COALESCE'd keys — the
    reconciliation shape (rows exclusive to either side must surface
    with NULL-filled counterparts identically in both engines)."""
    ka, kb = rng.randint(2, 9), rng.randint(2, 9)
    return (
        f"SELECT COALESCE(a.g, b.g) AS g, "
        f"CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders, "
        f"CAST(COALESCE(b.n, 0) AS BIGINT) AS n_cust "
        f"FROM (SELECT o_custkey % {ka} AS g, COUNT(*) AS n FROM orders "
        f"WHERE o_custkey % {rng.randint(2, 5)} = 0 GROUP BY 1) a "
        f"FULL OUTER JOIN "
        f"(SELECT c_custkey % {kb} AS g, COUNT(*) AS n FROM customer "
        f"WHERE c_custkey % {rng.randint(2, 5)} = 1 GROUP BY 1) b "
        f"ON a.g = b.g"
    )


def _gen_window_over_aggregate(rng: random.Random) -> str:
    """Two-level analytics: GROUP BY aggregate, then RANK/share-of-total
    windows OVER the aggregate rows — deterministic because ranking ties
    break on the unique group key and shares stay integer-ratio-free."""
    k = rng.randint(3, 12)
    return (
        f"SELECT g, n, "
        f"CAST(RANK() OVER (ORDER BY n DESC, g) AS BIGINT) AS rnk, "
        f"CAST(SUM(n) OVER () AS BIGINT) AS total, "
        f"CAST(SUM(n) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND CURRENT ROW) AS BIGINT) AS cum "
        f"FROM (SELECT o_custkey % {k} AS g, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM orders{_where(rng)} "
        f"GROUP BY 1) t"
    )


def _gen_exists_with_agg(rng: random.Random) -> str:
    """EXISTS whose correlated subquery carries its own aggregate
    HAVING — the anti/semi-join-with-threshold shape."""
    th = rng.randint(2, 8)
    op = rng.choice(["EXISTS", "NOT EXISTS"])
    return (
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders o WHERE {op} ("
        f"SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        f"GROUP BY l.l_orderkey HAVING COUNT(*) >= {th}) "
        f"GROUP BY o_orderstatus"
    )


def _gen_union_in_from(rng: random.Random) -> str:
    """UNION ALL inside a derived table, re-aggregated above — the
    multi-source fact-union shape."""
    ka = rng.randint(2, 7)
    return (
        f"SELECT g, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(v) AS BIGINT) AS s FROM ("
        f"SELECT o_custkey % {ka} AS g, o_orderkey AS v FROM orders "
        f"WHERE o_orderstatus = '{rng.choice(['O', 'F'])}' "
        f"UNION ALL "
        f"SELECT c_custkey % {ka} AS g, c_custkey AS v FROM customer "
        f"WHERE c_custkey % {rng.randint(2, 5)} = 0) t GROUP BY g"
    )


def _gen_window_in_cte_filtered(rng: random.Random) -> str:
    """Window computed in a CTE, filtered and re-joined outside — the
    top-k-then-enrich shape (window result used as a join input)."""
    topk = rng.randint(2, 6)
    return (
        f"WITH ranked AS ("
        f"SELECT o_custkey, o_orderkey, o_totalprice, "
        f"ROW_NUMBER() OVER (PARTITION BY o_custkey "
        f"ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) "
        f"SELECT r.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_top, "
        f"MIN(r.o_totalprice) AS min_top, "
        f"CAST(MAX(c.c_custkey) AS BIGINT) AS ck "
        f"FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey "
        f"WHERE r.rk <= {topk} AND r.o_custkey % {rng.randint(2, 6)} = 0 "
        f"GROUP BY r.o_custkey"
    )


def _gen_timestamp_proximity_join(rng: random.Random) -> str:
    """Self-join on a timestamp band (events within N minutes of a
    same-user event) — the temporal-dedup / burst-detection shape."""
    mins = rng.randint(5, 120)
    return (
        f"SELECT a.event_type AS t_a, b.event_type AS t_b, "
        f"CAST(COUNT(*) AS BIGINT) AS n_pairs "
        f"FROM events a JOIN events b "
        f"ON a.user_id = b.user_id AND a.event_id < b.event_id "
        f"AND b.ts <= a.ts + INTERVAL {mins} MINUTE "
        f"AND b.ts >= a.ts "
        f"WHERE a.user_id % {rng.randint(3, 9)} = 0 "
        f"GROUP BY a.event_type, b.event_type"
    )


def _gen_where_scalar_avg(rng: random.Random) -> str:
    """WHERE against an uncorrelated scalar aggregate subquery — the
    above-average filter (exact-decimal avg comparison)."""
    frac = rng.choice(["1.0", "1.5", "0.5", "2.0"])
    return (
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
        f"MIN(o_totalprice) AS m "
        f"FROM orders WHERE o_totalprice > {frac} * "
        f"(SELECT AVG(o_totalprice) FROM orders "
        f"WHERE o_custkey % {rng.randint(2, 6)} = 0) "
        f"GROUP BY o_orderstatus"
    )


def _gen_groupwise_max_joinback(rng: random.Random) -> str:
    """Row-of-the-max per group via aggregate + join-back, orderkey
    tie-break — the argmax shape without window functions."""
    k = rng.randint(3, 10)
    return (
        f"WITH mx AS (SELECT o_custkey % {k} AS g, "
        f"MAX(o_totalprice) AS mp FROM orders GROUP BY 1) "
        f"SELECT m.g, m.mp, "
        f"CAST(MIN(o.o_orderkey) AS BIGINT) AS first_orderkey "
        f"FROM mx m JOIN orders o "
        f"ON o.o_custkey % {k} = m.g AND o.o_totalprice = m.mp "
        f"GROUP BY m.g, m.mp"
    )


def _gen_window_over_distinct_agg(rng: random.Random) -> str:
    """Window functions layered over COUNT(DISTINCT) group aggregates —
    rank/share-of-partition analytics on deduplicated counts."""
    k = rng.randint(3, 9)
    col = rng.choice(["o_orderpriority", "o_custkey % 4"])
    return (
        f"WITH g AS (SELECT o_orderstatus AS st, o_custkey % {k} AS grp, "
        f"CAST(COUNT(DISTINCT {col}) AS BIGINT) AS dc "
        f"FROM orders{_where(rng)} GROUP BY 1, 2) "
        f"SELECT st, grp, dc, "
        f"CAST(RANK() OVER (PARTITION BY st ORDER BY dc DESC, grp) "
        f"AS BIGINT) AS rk, "
        f"CAST(SUM(dc) OVER (PARTITION BY st) AS BIGINT) AS tot FROM g"
    )


def _gen_exists_in_case(rng: random.Random) -> str:
    """Correlated EXISTS inside a CASE inside an aggregate — the
    conditional-count-by-probe shape."""
    bal = rng.randint(0, 5000)
    status = rng.choice(["'O'", "'F'", "'P'"])
    return (
        f"SELECT o_orderstatus, "
        f"CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM customer c "
        f"WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > {bal}) "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS n_hit, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders o WHERE o_orderstatus = {status} "
        f"GROUP BY o_orderstatus"
    )


def _gen_chained_correlated_subquery(rng: random.Random) -> str:
    """Two-deep nested correlation: the innermost IN-subquery
    correlates to ITS outer (o2), which itself correlates to the
    outermost (o). NOTE a true two-outer-level reference (innermost
    touching o directly) is rejected by Spark's analyzer
    (UNRESOLVED_COLUMN — correlation is single-level only), so that
    variant is a documented dialect boundary, not a corpus shape."""
    ln = rng.randint(1, 5)
    return (
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders o "
        f"WHERE o.o_totalprice > ("
        f"SELECT MIN(o2.o_totalprice) FROM orders o2 "
        f"WHERE o2.o_custkey = o.o_custkey "
        f"AND o2.o_orderkey IN (SELECT l.l_orderkey FROM lineitem l "
        f"WHERE l.l_orderkey = o2.o_orderkey "
        f"AND l.l_linenumber <= {ln})) "
        f"GROUP BY o_orderstatus"
    )


def _gen_case_bucket_distinct(rng: random.Random) -> str:
    """GROUP BY a CASE bucket expression with COUNT DISTINCT — the
    histogram-with-dedup shape."""
    lo = rng.randint(20000, 80000)
    hi = lo + rng.randint(50000, 150000)
    return (
        f"SELECT CASE WHEN o_totalprice < {lo} THEN 'lo' "
        f"WHEN o_totalprice < {hi} THEN 'mid' ELSE 'hi' END AS bucket, "
        f"CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nc, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders{_where(rng)} GROUP BY 1"
    )


def _gen_exists_not_exists_mix(rng: random.Random) -> str:
    """Semi join AND anti join on the same probe table in one WHERE."""
    status = rng.choice(["'O'", "'F'", "'P'"])
    cap = rng.randint(150000, 400000)
    return (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer c "
        f"WHERE EXISTS (SELECT 1 FROM orders o "
        f"WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = {status}) "
        f"AND NOT EXISTS (SELECT 1 FROM orders o2 "
        f"WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > {cap})"
    )


def _gen_null_safe_join(rng: random.Random) -> str:
    """Null-safe equality join (IS NOT DISTINCT FROM): NULLIF-derived
    keys on both sides so the NULL = NULL bucket actually joins — the
    semantics `=` silently drops."""
    s1 = rng.choice(["'O'", "'F'", "'P'"])
    s2 = rng.choice(["'O'", "'F'", "'P'"])
    return (
        f"WITH a AS (SELECT NULLIF(o_orderstatus, {s1}) AS k, "
        f"CAST(COUNT(*) AS BIGINT) AS na FROM orders{_where(rng)} "
        f"GROUP BY 1), "
        f"b AS (SELECT NULLIF(o_orderstatus, {s2}) AS k, "
        f"CAST(SUM(o_orderkey) AS BIGINT) AS nb FROM orders GROUP BY 1) "
        f"SELECT a.k, a.na, b.nb FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k"
    )


def _gen_filter_over_window_col(rng: random.Random) -> str:
    """Aggregate FILTER clauses whose predicates read a WINDOW-derived
    column from the inner query — filter-after-rank semantics must
    agree across engines (deterministic: the rank order always ends
    with the unique o_orderkey tie-break)."""
    part = rng.choice(["o_orderstatus", "o_orderpriority"])
    order = rng.choice(
        ["o_totalprice DESC, o_orderkey", "o_orderdate, o_orderkey"]
    )
    k = rng.randint(2, 6)
    m = rng.randint(2, 4)
    return (
        f"SELECT {part}, "
        f"CAST(COUNT(*) FILTER (WHERE rn <= {k}) AS BIGINT) AS a0, "
        f"CAST(SUM(o_orderkey) FILTER (WHERE rn % {m} = 0) AS BIGINT) AS a1, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM (SELECT {part}, o_orderkey, "
        f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {order}) AS rn "
        f"FROM orders{_where(rng)}) t GROUP BY {part}"
    )


def _gen_union_in_correlated_in(rng: random.Random) -> str:
    """UNION ALL inside a correlated IN-subquery — BOTH branches carry
    their own correlation to the outer row (Spark decorrelates each
    branch independently; duplicate keys from the union must not
    change IN's set semantics)."""
    ln = rng.randint(1, 4)
    qty = rng.randint(20, 45)
    return (
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders o WHERE o.o_orderkey IN ("
        f"SELECT l.l_orderkey FROM lineitem l "
        f"WHERE l.l_orderkey = o.o_orderkey AND l.l_linenumber = {ln} "
        f"UNION ALL "
        f"SELECT l2.l_orderkey FROM lineitem l2 "
        f"WHERE l2.l_orderkey = o.o_orderkey AND l2.l_quantity > {qty}) "
        f"GROUP BY o_orderstatus"
    )


def _gen_group_by_all(rng: random.Random) -> str:
    """GROUP BY ALL — both engines infer the grouping keys from the
    non-aggregate select list; the inference must agree (a mixed
    computed-key + plain-key select exercises the inference rule)."""
    lo = rng.randint(50000, 200000)
    aggs = [
        f"{a} AS a{i}"
        for i, a in enumerate(rng.sample(_AGGS[:5], rng.randint(1, 3)))
    ]
    return (
        f"SELECT o_orderstatus, "
        f"CASE WHEN o_totalprice < {lo} THEN 'lo' ELSE 'hi' END AS bucket, "
        f"{', '.join(aggs)} FROM orders{_where(rng)} GROUP BY ALL"
    )


def _gen_lateral_alias_reuse(rng: random.Random) -> str:
    """Lateral column alias reuse: later select items reference earlier
    aliases (including an alias OF an alias) — both engines must
    resolve the chain against the same expression, not a same-named
    table column."""
    m = rng.randint(3, 9)
    d = rng.randint(2, 5)
    aggs = rng.choice(
        ["CAST(SUM(o_orderkey) AS BIGINT)", "CAST(COUNT(*) AS BIGINT)"]
    )
    return (
        f"SELECT o_orderstatus, {aggs} AS s, "
        f"s % {m} AS s_mod, s_mod * {d} + 1 AS s_chain "
        f"FROM orders{_where(rng)} GROUP BY o_orderstatus"
    )


def _gen_named_window_qualify(rng: random.Random) -> str:
    """The QUALIFY-equivalent: a NAMED window (WINDOW w AS ...) shared
    by two window functions, filtered on the rank column from the
    outer query — named-window resolution and filter-after-window
    semantics must agree (unique o_orderkey tie-break keeps every rank
    deterministic)."""
    part = rng.choice(["o_orderstatus", "o_orderpriority"])
    order = rng.choice(
        ["o_totalprice DESC, o_orderkey", "o_orderdate, o_orderkey"]
    )
    k = rng.randint(2, 6)
    return (
        f"SELECT {part}, o_orderkey, rn, cum FROM ("
        f"SELECT {part}, o_orderkey, "
        f"CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn, "
        f"CAST(SUM(o_orderkey) OVER w AS BIGINT) AS cum "
        f"FROM orders{_where(rng)} "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY {order})"
        f") t WHERE rn <= {k}"
    )


def _gen_window_nulls_first_last(rng: random.Random) -> str:
    """Explicit NULLS FIRST/LAST inside a window ORDER BY over a
    NULLIF-derived key: the engines' DEFAULT null placement differs by
    direction, so the explicit placement is what must agree — checked
    by summing the ranks the NULL rows landed on."""
    s = rng.choice(["'O'", "'F'", "'P'"])
    direction = rng.choice(
        ["ASC NULLS FIRST", "ASC NULLS LAST", "DESC NULLS FIRST", "DESC NULLS LAST"]
    )
    return (
        f"SELECT CAST(SUM(CASE WHEN k IS NULL THEN rn ELSE 0 END) AS BIGINT)"
        f" AS null_rank_sum, "
        f"CAST(MAX(CASE WHEN k IS NULL THEN rn END) AS BIGINT) AS null_max_rn, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM ("
        f"SELECT k, ROW_NUMBER() OVER (ORDER BY k {direction}, o_orderkey) AS rn "
        f"FROM (SELECT NULLIF(o_orderstatus, {s}) AS k, o_orderkey "
        f"FROM orders{_where(rng)}) b) t"
    )


def _gen_values_derived_join(rng: random.Random) -> str:
    """Inline VALUES derived table joined against a real table — the
    constant-relation join both engines must type identically (the
    broadcast-dimension idiom at its smallest)."""
    segs = rng.sample(
        ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
        rng.randint(2, 4),
    )
    vals = ", ".join(f"('{s}', {i + 1})" for i, s in enumerate(segs))
    return (
        f"SELECT v.tier, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(o_orderkey) AS BIGINT) AS s "
        f"FROM orders JOIN customer ON o_custkey = c_custkey "
        f"JOIN (VALUES {vals}) v(seg, tier) ON c_mktsegment = v.seg"
        f"{_where(rng)} GROUP BY v.tier"
    )


def _gen_rollup_grouping_fn(rng: random.Random) -> str:
    """ROLLUP with the GROUPING() marker function — subtotal rows must
    carry the same marker values and NULL grouping keys in both
    engines. The WHERE stays single-predicate and satisfiable: on an
    EMPTY input the engines genuinely diverge (DuckDB emits the ANSI
    grand-total row for the () grouping set, Spark returns zero rows),
    so the conformance subset is rollup-over-non-empty only."""
    a = rng.choice(["o_orderstatus", "o_orderpriority"])
    agg = rng.choice(
        ["CAST(SUM(o_orderkey) AS BIGINT)", "CAST(COUNT(*) AS BIGINT)"]
    )
    pred = rng.choice(
        [
            "",
            f" WHERE o_totalprice > {rng.randint(1000, 100000)}",
            f" WHERE o_custkey % {rng.randint(2, 7)} = 0",
        ]
    )
    return (
        f"SELECT {a}, CAST(GROUPING({a}) AS BIGINT) AS g_marker, "
        f"{agg} AS v FROM orders{pred} GROUP BY ROLLUP({a})"
    )


def _gen_limit_offset_page(rng: random.Random) -> str:
    """LIMIT/OFFSET pagination over a fully deterministic total order
    (unique o_orderkey tie-break) — page boundaries must slice
    identically."""
    off = rng.randint(1, 40)
    lim = rng.randint(3, 12)
    return (
        f"SELECT o_orderkey, o_totalprice FROM orders{_where(rng)} "
        f"ORDER BY o_totalprice DESC, o_orderkey "
        f"LIMIT {lim} OFFSET {off}"
    )


def _gen_setop_all(rng: random.Random) -> str:
    """INTERSECT ALL / EXCEPT ALL — BAG semantics: duplicate
    multiplicities must match exactly (min / difference of per-row
    counts), not collapse to DISTINCT like the plain set ops the
    _gen_setop shape covers."""
    op = rng.choice(["INTERSECT ALL", "EXCEPT ALL"])
    k = rng.randint(2, 9)
    proj = f"o_orderstatus, o_custkey % {k} AS b"
    return (
        f"SELECT {proj} FROM orders{_where(rng)} "
        f"{op} "
        f"SELECT {proj} FROM orders{_where(rng)}"
    )


def _gen_filtered_agg_gsets_window(rng: random.Random) -> str:
    """FILTERed aggregates over GROUPING SETS feeding a window: the
    FILTER clause must apply per-set (the () grand-total row filters
    the same predicate), and the outer RANK must order the mixed
    NULL/value grouping rows identically in both engines (COALESCE
    tie-break keeps the order total)."""
    g = rng.choice(["o_orderstatus", "o_orderpriority"])
    k = rng.randint(2, 7)
    thr = rng.randint(1000, 300000)
    return (
        f"WITH g AS ("
        f"SELECT {g}, "
        f"CAST(COUNT(*) FILTER (WHERE o_custkey % {k} = 0) AS BIGINT) AS c_f, "
        f"CAST(SUM(o_orderkey) FILTER (WHERE o_totalprice > {thr}) AS BIGINT)"
        f" AS s_f "
        f"FROM orders{_where(rng)} GROUP BY GROUPING SETS (({g}), ())"
        f") SELECT {g}, c_f, s_f, "
        f"CAST(RANK() OVER (ORDER BY c_f DESC, COALESCE({g}, '~')) AS BIGINT)"
        f" AS r FROM g"
    )


def _gen_unpivot(rng: random.Random) -> str:
    """Standard-SQL UNPIVOT (Spark 3.4+ and DuckDB parse the same
    clause): wide integer columns fold to (name, val) rows. Integer
    columns only — CAST(double AS BIGINT) rounds in DuckDB but
    truncates in Spark, so no float column may enter the fold."""
    mod = rng.randint(2, 17)
    filt = rng.randint(2, 9)
    cols = rng.sample(["ck", "bucket", "pk"], rng.randint(2, 3))
    return (
        f"SELECT o_orderkey, name, val FROM ("
        f"SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS ck, "
        f"CAST(o_orderkey % {mod} AS BIGINT) AS bucket, "
        f"CAST(o_custkey % {mod + 1} AS BIGINT) AS pk "
        f"FROM orders WHERE o_orderkey % {filt} = 0) "
        f"UNPIVOT (val FOR name IN ({', '.join(cols)}))"
    )


def _gen_recursive_cte(rng: random.Random) -> str:
    """WITH RECURSIVE (Spark 4.x and DuckDB share the standard syntax):
    a bounded integer-sequence anchor + recursive step joined against
    orders — the recursion must terminate at the same depth and the
    join must see identical sequences in both engines."""
    depth = rng.randint(3, 8)
    mod = rng.randint(5, 11)
    step = rng.randint(1, 3)
    return (
        f"WITH RECURSIVE seq(n) AS ("
        f"SELECT {rng.randint(0, 2)} "
        f"UNION ALL SELECT n + {step} FROM seq WHERE n < {depth * step}"
        f") "
        f"SELECT s.n, CAST(COUNT(*) AS BIGINT) AS c, "
        f"CAST(SUM(o.o_orderkey % {mod + 2}) AS BIGINT) AS s2 "
        f"FROM seq s JOIN orders o ON o.o_custkey % {mod} = s.n % {mod} "
        f"GROUP BY s.n"
    )


def _gen_ordinal_group_order(rng: random.Random) -> str:
    """GROUP BY / ORDER BY ordinal positions — both engines must
    resolve ordinals against the same select-list positions, including
    when an expression (not a bare column) sits at that position."""
    mod = rng.randint(2, 9)
    aggs = rng.sample(_AGGS, rng.randint(1, 2))
    sel = [f"o_orderstatus", f"o_custkey % {mod}"] + [
        f"{a} AS a{i}" for i, a in enumerate(aggs)
    ]
    return (
        f"SELECT {', '.join(sel)} FROM orders{_where(rng)} "
        f"GROUP BY 1, 2 ORDER BY 1, 2 LIMIT {rng.randint(5, 25)}"
    )


def _gen_nullif_coalesce(rng: random.Random) -> str:
    """NULLIF / COALESCE null-injection algebra over pure integer ops
    (no division — CAST(double AS BIGINT) rounds in DuckDB, truncates
    in Spark): NULLIF must produce NULLs that COUNT skips and COALESCE
    must repair, identically in both engines."""
    m1, m2 = rng.randint(2, 9), rng.randint(2, 13)
    sentinel = rng.randint(0, m1 - 1)
    dflt = rng.choice([-1, 0, 7])
    return (
        f"SELECT o_custkey % {m2} AS b, "
        f"CAST(SUM(COALESCE(NULLIF(o_custkey % {m1}, {sentinel}), {dflt})"
        f" * (o_orderkey % {m2 + 2})) AS BIGINT) AS v, "
        f"CAST(COUNT(NULLIF(o_orderstatus, "
        f"'{rng.choice(['O', 'F', 'P'])}')) AS BIGINT) AS nf "
        f"FROM orders{_where(rng)} GROUP BY o_custkey % {m2}"
    )


def _gen_try_cast(rng: random.Random) -> str:
    """TRY_CAST over strings that only sometimes parse: the failure set
    (NULL) must be identical in both engines — COUNT skips the NULLs,
    COALESCE repairs them with a sentinel."""
    n = rng.randint(1, 2)
    sent = rng.choice([-1, 0, 99])
    return (
        f"SELECT o_orderstatus, "
        f"CAST(SUM(COALESCE(TRY_CAST(SUBSTR(o_orderpriority, 1, {n}) AS INT),"
        f" {sent})) AS BIGINT) AS v, "
        f"CAST(COUNT(TRY_CAST(o_orderpriority AS INT)) AS BIGINT) AS n_ok "
        f"FROM orders{_where(rng)} GROUP BY o_orderstatus"
    )


def _gen_interval_arith(rng: random.Random) -> str:
    """Timestamp + INTERVAL arithmetic in predicates and grouping —
    both engines must land the shifted timestamps on the same side of
    the literal boundary."""
    days = rng.randint(7, 120)
    y = rng.randint(1995, 1998)
    m = rng.randint(1, 9)
    return (
        f"SELECT CAST(o_orderdate + INTERVAL {days} DAY AS TIMESTAMP)"
        f" AS shifted, CAST(COUNT(*) AS BIGINT) AS c "
        f"FROM orders WHERE o_orderdate + INTERVAL {days} DAY "
        f"< TIMESTAMP '{y}-0{m}-01 00:00:00' "
        f"GROUP BY o_orderdate ORDER BY shifted LIMIT {rng.randint(5, 20)}"
    )


def _gen_greatest_least(rng: random.Random) -> str:
    """GREATEST/LEAST over integer expressions with NULLIF-injected
    NULLs — both engines skip NULL arguments (largest/smallest
    non-NULL), a semantic worth locking because older dialects return
    NULL on any NULL argument."""
    m1, m2 = rng.randint(2, 9), rng.randint(2, 7)
    lit = rng.randint(1, 5)
    sent = rng.randint(0, m1 - 1)
    return (
        f"SELECT o_orderstatus, "
        f"CAST(SUM(GREATEST(o_custkey % {m1}, o_orderkey % {m2}, {lit}))"
        f" AS BIGINT) AS g, "
        f"CAST(SUM(LEAST(NULLIF(o_custkey % {m1}, {sent}), {lit}))"
        f" AS BIGINT) AS l "
        f"FROM orders{_where(rng)} GROUP BY o_orderstatus"
    )


def _gen_lag_lead_defaults(rng: random.Random) -> str:
    """LAG/LEAD with explicit offsets AND default values — the default
    must fill the same frame-edge rows in both engines."""
    off = rng.randint(1, 3)
    dflt = rng.choice([-1, 0, 999])
    m = rng.randint(5, 17)
    return (
        f"SELECT o_orderkey, "
        f"LAG(o_orderkey, {off}, {dflt}) OVER "
        f"(PARTITION BY o_orderstatus ORDER BY o_orderkey) AS prev_k, "
        f"LEAD(o_custkey, {off}, {dflt}) OVER "
        f"(PARTITION BY o_orderstatus ORDER BY o_orderkey) AS next_c "
        f"FROM orders WHERE o_orderkey % {m} = 0 "
        f"ORDER BY o_orderkey LIMIT {rng.randint(10, 40)}"
    )


def _gen_string_funcs_distinct(rng: random.Random) -> str:
    """LPAD/REVERSE/REPEAT/SUBSTR agreement under COUNT DISTINCT.
    Spark requires a length on VARCHAR casts (bare VARCHAR is a parse
    error) while DuckDB accepts both — VARCHAR(n) is the shared form."""
    m = rng.randint(10, 99)
    w = rng.randint(3, 6)
    return (
        f"SELECT o_orderstatus, "
        f"COUNT(DISTINCT LPAD(CAST(o_custkey % {m} AS VARCHAR(8)), {w}, "
        f"'0')) AS pads, "
        f"COUNT(DISTINCT REVERSE(SUBSTR(o_orderpriority, 1, "
        f"{rng.randint(2, 5)}))) AS revs, "
        f"COUNT(DISTINCT REPEAT(o_orderstatus, {rng.randint(2, 3)})) AS reps "
        f"FROM orders{_where(rng)} GROUP BY o_orderstatus"
    )


def _gen_extract_ymd(rng: random.Random) -> str:
    """EXTRACT(YEAR/MONTH/DAY) grouping — CAST to BIGINT because Spark
    returns int where DuckDB returns bigint (integral widening, safe).
    DOW is deliberately EXCLUDED: Spark numbers it 1-7 (Sunday=1) where
    DuckDB numbers 0-6 (Sunday=0) — a confirmed dialect divergence, not
    a shared corner."""
    fields = rng.sample(["YEAR", "MONTH", "DAY"], rng.randint(1, 2))
    sel = ", ".join(
        f"CAST(EXTRACT({f} FROM o_orderdate) AS BIGINT) AS f{i}"
        for i, f in enumerate(fields)
    )
    ords = ", ".join(str(i + 1) for i in range(len(fields)))
    return (
        f"SELECT {sel}, CAST(COUNT(*) AS BIGINT) AS c "
        f"FROM orders{_where(rng)} GROUP BY {ords} ORDER BY {ords} "
        f"LIMIT {rng.randint(10, 40)}"
    )


def _gen_rank_fraction_windows(rng: random.Random) -> str:
    """NTILE / PERCENT_RANK / CUME_DIST — the fractional rank trio.
    Safe floats: each is an exact rational of small integers ((rank-1)/
    (n-1), rows/n) computed with one division from identical operands
    in both engines, so the doubles agree bit-for-bit."""
    m = rng.randint(5, 17)
    tiles = rng.randint(2, 7)
    return (
        f"SELECT o_orderkey, "
        f"CAST(NTILE({tiles}) OVER w AS BIGINT) AS tile, "
        f"PERCENT_RANK() OVER w AS pr, "
        f"CUME_DIST() OVER w AS cd "
        f"FROM orders WHERE o_orderkey % {m} = 0 "
        f"WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey) "
        f"ORDER BY o_orderkey LIMIT {rng.randint(10, 40)}"
    )


def _gen_bitwise_group(rng: random.Random) -> str:
    """Bitwise & and | in grouping keys and summed expressions. The
    shared operator subset is & and | ONLY: Spark's ^ is XOR where
    DuckDB's ^ is POWER (a confirmed divergence), and multi-column
    row-value IN subqueries bind in Spark but not DuckDB — both
    excluded. (Discovered writing this shape.)"""
    m = rng.choice([3, 7, 15, 31])
    k = rng.choice([1, 2, 4, 8])
    return (
        f"SELECT o_custkey & {m} AS bucket, "
        f"CAST(SUM(o_orderkey | {k}) AS BIGINT) AS s, "
        f"CAST(COUNT(*) AS BIGINT) AS c "
        f"FROM orders{_where(rng)} GROUP BY o_custkey & {m} "
        f"ORDER BY bucket"
    )


def _gen_percentile_cont_quarters(rng: random.Random) -> str:
    """PERCENTILE_CONT at dyadic quantiles (0.25/0.5/0.75) over INTEGER
    expressions: the interpolated value is an exact dyadic rational that
    fits a double, so a + (b-a)*f and (1-f)*a + f*b — whichever formula
    each engine uses — produce the same bits. Float quantiles over
    arbitrary doubles stay excluded (interpolation-formula ulps)."""
    p = rng.choice(["0.25", "0.5", "0.75"])
    m = rng.randint(7, 31)
    return (
        f"SELECT o_orderstatus, "
        f"PERCENTILE_CONT({p}) WITHIN GROUP (ORDER BY o_custkey % {m}) AS q, "
        f"CAST(COUNT(*) AS BIGINT) AS c "
        f"FROM orders{_where(rng)} GROUP BY o_orderstatus"
    )


def _gen_global_having(rng: random.Random) -> str:
    """HAVING without GROUP BY — the implicit single global group. The
    row either exists (aggregates over the whole filtered input) or the
    result is empty; both engines must agree on that boundary."""
    agg = rng.choice(_AGGS)
    n = rng.randint(0, 40000)
    return (
        f"SELECT {agg} AS a, CAST(COUNT(*) AS BIGINT) AS c "
        f"FROM orders{_where(rng)} HAVING COUNT(*) > {n}"
    )


def _gen_order_by_hidden_expr(rng: random.Random) -> str:
    """ORDER BY an expression that is NOT in the select list (plus a
    tie-break) — resolution against the underlying relation, not the
    projection, in both engines."""
    m = rng.randint(3, 13)
    return (
        f"SELECT o_orderkey, o_orderstatus "
        f"FROM orders{_where(rng)} "
        f"ORDER BY o_custkey % {m}, o_totalprice DESC, o_orderkey "
        f"LIMIT {rng.randint(10, 50)}"
    )


def _gen_diamond_cte(rng: random.Random) -> str:
    """Diamond-shaped plan: ONE aggregating CTE consumed twice through
    different filters and re-joined — CTE materialization vs inlining
    must not change results in either engine."""
    m = rng.randint(2, 7)
    lo = rng.randint(1, 5)
    return (
        f"WITH agg AS ("
        f"SELECT o_custkey % {m} AS b, o_orderstatus AS st, "
        f"CAST(COUNT(*) AS BIGINT) AS c "
        f"FROM orders{_where(rng)} GROUP BY 1, 2) "
        f"SELECT a.b, a.st AS st_a, d.st AS st_b, a.c AS c_a, d.c AS c_b "
        f"FROM agg a JOIN agg d ON a.b = d.b AND a.st < d.st "
        f"WHERE a.c >= {lo} ORDER BY a.b, st_a, st_b"
    )


def _corpus() -> list[str]:
    rng = random.Random(SEED)
    return (
        [_gen_groupby(rng) for _ in range(N_PER_SHAPE)]
        + [_gen_join(rng) for _ in range(N_PER_SHAPE // 2)]
        + [_gen_window(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_events(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_lineitem(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_orderby_limit(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_setop(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_outer_join(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_scalar_subquery(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_exists(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_range_window(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_grouping_sets(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_string_funcs(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_datetime(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_having_distinct(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_in_subquery(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_correlated_scalar_select(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_chained_cte(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_filter_agg(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_lateral(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_not_in_null(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_rows_frame(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_theta_self_join(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_conditional_pivot(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_full_outer_coalesce(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_window_over_aggregate(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_exists_with_agg(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_union_in_from(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_window_in_cte_filtered(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_timestamp_proximity_join(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_where_scalar_avg(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_groupwise_max_joinback(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_window_over_distinct_agg(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_exists_in_case(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_chained_correlated_subquery(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_case_bucket_distinct(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_exists_not_exists_mix(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_null_safe_join(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_filter_over_window_col(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_union_in_correlated_in(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_group_by_all(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_lateral_alias_reuse(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_named_window_qualify(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_window_nulls_first_last(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_values_derived_join(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_rollup_grouping_fn(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_limit_offset_page(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_setop_all(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_filtered_agg_gsets_window(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_unpivot(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_recursive_cte(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_ordinal_group_order(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_nullif_coalesce(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_try_cast(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_interval_arith(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_greatest_least(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_lag_lead_defaults(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_string_funcs_distinct(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_extract_ymd(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_rank_fraction_windows(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_bitwise_group(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_percentile_cont_quarters(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_global_having(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_order_by_hidden_expr(rng) for _ in range(N_PER_SHAPE // 4)]
        + [_gen_diamond_cte(rng) for _ in range(N_PER_SHAPE // 4)]
    )


QUERIES = _corpus()


@pytest.fixture(scope="module")
def fuzz_env(spark):
    from audit_star_spark.sources.testdata import load_table

    for t in ("orders", "customer", "events", "lineitem"):
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize(
    "q", QUERIES, ids=[f"fuzz_{i:03d}" for i in range(len(QUERIES))]
)
def test_spark_and_duckdb_agree(spark, fuzz_env, q):
    compare(spark.sql(q), fuzz_env, q, name=q)
