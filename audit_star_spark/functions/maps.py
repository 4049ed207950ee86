"""Map/diff algebra — the capture-path operators of the engine.

Re-expresses the reference trigger's hstore algebra (operators A1–A7 of
SURVEY.md §2A; reference /root/reference/audit/audit.go:872–926) as Spark
built-in higher-order map functions. Everything here stays inside
whole-stage codegen — no Python UDFs.

hstore semantics notes (PostgreSQL):
- ``hstore(row)`` stringifies every column; NULL column values become map
  entries with NULL values (key present, value NULL).
- ``a - b`` keeps pairs of ``a`` that are not present *identically* in
  ``b``: a pair survives if its key is absent from ``b`` OR mapped to a
  different (NULL-distinct) value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def row_to_map(cols: dict[str, Column]) -> Column:
    """A1 — row -> text->text map with all values stringified.

    Equivalent of ``hstore(NEW)`` (audit.go:888). ``cols`` maps column name
    to an (already type-normalized) Column; values are cast to string here
    so NULLs survive as NULL-valued map entries (unlike a to_json round
    trip, which would drop them under ignoreNullFields).
    """
    pairs: list[Column] = []
    for name, col in cols.items():
        pairs.append(F.lit(name))
        pairs.append(col.cast("string"))
    return F.create_map(*pairs)


def map_diff(a: Column, b: Column) -> Column:
    """A2/A3 — hstore difference ``a - b`` (audit.go:889,892).

    Pairs of ``a`` whose key is missing from ``b`` or mapped to a distinct
    value (NULL-safe). With ``a=old, b=new`` this yields old values of
    changed columns; swapped, new values of changed columns.
    """
    return F.map_filter(
        a,
        lambda k, v: (~F.map_contains_key(b, k)) | (~F.element_at(b, k).eqNullSafe(v)),
    )


def truncate_values(m: Column, max_len: int = 500) -> Column:
    """A4 — cap stored value size (audit.go:889,907: substring 1..500).

    The reference explodes the hstore and re-aggregates; Spark has
    ``transform_values`` so no explode is needed.
    """
    return F.transform_values(m, lambda _, v: F.substring(v, 1, max_len))


def map_key_present(m: Column, key: Column | str) -> Column:
    """A5 — ``m ? key`` (audit.go:890,899,908)."""
    k = F.lit(key) if isinstance(key, str) else key
    return F.map_contains_key(m, k)


def map_lookup(m: Column, key: Column | str) -> Column:
    """A6 — ``m -> key`` (audit.go:892,901,910)."""
    k = F.lit(key) if isinstance(key, str) else key
    return F.element_at(m, k)


def map_to_json(m: Column) -> Column:
    """A7 — serialize a diff map for the storage/API boundary
    (``hstore_to_json``, audit.go:892). Internally the engine keeps
    MapType; JSON only at boundaries."""
    return F.to_json(m)


def canonical_diff_string(m: Column) -> Column:
    """Deterministic flat rendering of a diff map: entries sorted by key,
    ``k=v`` joined with ``|``; NULL values rendered as ``k=∅``. Used where a
    map must be compared across engines (value-hash parity) — JSON key
    order is not guaranteed across engines, sorted entries are."""
    entries = F.array_sort(F.map_entries(m))
    rendered = F.transform(
        entries,
        lambda e: F.concat_ws(
            "=", e.getField("key"), F.coalesce(e.getField("value"), F.lit("∅"))
        ),
    )
    return F.array_join(rendered, "|")
