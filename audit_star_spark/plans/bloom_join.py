"""Bloom-filter semi-join pre-filter — the classic 100 TB
shuffle-reduction pattern (Bloom 1970; Spark itself grew a runtime
variant of this as ``spark.sql.optimizer.runtime.bloomFilter.enabled``,
SPARK-32268).

When a selective dimension filter drives a fact-table join, the fact
side normally ships EVERY row into the join shuffle and lets the join
drop the misses. This module builds a deterministic Bloom bitmap over
the (small) key set, evaluates membership as a pure JVM-side bitwise
expression on the fact scan — before any shuffle — and only then runs
the exact semi-join to kill the (bounded-probability) false positives.
The result is exactly the semi-join; the bloom stage only removes
shuffle traffic.

Determinism: bit positions are the repo's cross-engine md5 integer
hash, seeded per hash function — so a SQL oracle (``bloom_probe_sql``)
reproduces the candidate set bit-for-bit, making even the intermediate
filter auditable.

Scale shape: the build aggregates DISTINCT bit positions — at most
``m_bits`` longs reach the driver REGARDLESS of key-set size (same
bounded-materialization contract as Spark's own broadcast exchange);
the probe is whole-stage-codegen bit arithmetic against an
``array<bigint>`` literal of ``m_bits / 64`` words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 16
BLOOM_K = 4


def _pos_expr(key_col: str, seed: int, m_bits: int) -> str:
    """Seeded md5-derived bit position (60-bit integer hash % m)."""
    h = (
        f"CAST(conv(substring(md5(concat(CAST({key_col} AS STRING), ':', "
        f"'{seed}')), 1, 15), 16, 10) AS BIGINT)"
    )
    return f"({h} % {m_bits})"


def bloom_build(
    small: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> list[int]:
    """Build the bitmap: ``m_bits / 64`` signed-long words.

    Distributed part: one distinct-aggregation over the seeded bit
    positions; driver part: fold the <= m_bits distinct positions into
    the word array (bounded by the bitmap size, never by the key
    count)."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = small.filter(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(*[F.expr(_pos_expr(key_col, i, m_bits)) for i in range(k)])
        ).alias("pos")
    )
    words = [0] * (m_bits // 64)
    for row in pos.distinct().collect():
        p = row["pos"]
        words[p // 64] |= 1 << (p % 64)
    # array<bigint> literal: wrap to signed 64-bit
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe_filter(
    df: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """``df`` filtered to bloom candidates: all ``k`` seeded bits set.

    The bitmap is spliced in as one ``array(...)`` SQL literal so the
    whole predicate is a single codegen-friendly expression tree."""
    lit = "array(" + ", ".join(f"{int(w)}L" for w in words) + ")"
    preds = []
    for i in range(k):
        p = _pos_expr(key_col, i, m_bits)
        preds.append(
            f"(shiftright(element_at({lit}, CAST({p} div 64 AS INT) + 1), "
            f"CAST({p} % 64 AS INT)) & 1) = 1"
        )
    return df.filter(F.expr(" AND ".join(preds)))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Exactly ``big LEFT SEMI JOIN small`` — with a bloom pre-filter
    on the big side so rows that cannot match never reach the join.
    The final broadcast semi-join removes the false positives, so the
    approximation never leaks into the result."""
    words = bloom_build(small, small_key, m_bits, k)
    candidates = bloom_probe_filter(big, big_key, words, m_bits, k)
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    return candidates.join(F.broadcast(keys), big_key, "left_semi")


def bloom_probe_sql(
    probe_key: str,
    small_table_sql: str,
    small_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> str:
    """DuckDB mirror of the membership test, as a correlated predicate
    fragment: TRUE iff all k seeded positions of ``probe_key`` are in
    the small side's position set. Splice into a WHERE clause; pair
    with CTEs ``__bloom_pos`` produced by bloom_pos_cte_sql."""
    probes = []
    for i in range(k):
        h = (
            f"('0x' || substr(md5(CAST({probe_key} AS VARCHAR) || ':' || "
            f"'{i}'), 1, 15))::BIGINT"
        )
        probes.append(
            f"(({h}) % {m_bits}) IN (SELECT pos FROM __bloom_pos)"
        )
    return "(" + " AND ".join(probes) + ")"


def bloom_pos_cte_sql(
    small_table_sql: str,
    small_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> str:
    """The ``__bloom_pos`` CTE body: distinct seeded bit positions of
    the small side — the oracle's view of the bitmap."""
    h = (
        f"('0x' || substr(md5(CAST({small_key} AS VARCHAR) || ':' || "
        f"CAST(i AS VARCHAR)), 1, 15))::BIGINT"
    )
    return f"""
SELECT DISTINCT ({h}) % {m_bits} AS pos
FROM ({small_table_sql}) CROSS JOIN (SELECT UNNEST(range({k})) AS i)
WHERE {small_key} IS NOT NULL
"""
