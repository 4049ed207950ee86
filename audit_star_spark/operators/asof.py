"""As-of (point-in-time) join — a temporal operator the reference expresses
only implicitly (B2's "first later event" correlated subquery, audit.go:
1073–1080). Generalized here as a first-class backward as-of join.

Scale design: NOT a range join (which explodes to |L|x|R| candidate pairs
before filtering). Instead: union both sides, one shuffle on the key, one
ordered window pass carrying the latest right-side payload forward — the
same single-Exchange shape as the reconstruction views. O((|L|+|R|) log)
per key group, skew-safe under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audit_star_spark.util import qcol


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the payload of the LATEST right row of the
    same key with right_ts <= left_ts (inclusive — ties pick the right row).

    Returns all left columns plus ``{payload_prefix}{right_ts}`` and
    ``{payload_prefix}{col}`` for each payload col (NULL when no match).
    """
    l_tag = left.select(
        *[qcol(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
    )
    payload_struct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[qcol(c).alias(c) for c in payload_cols],
    )
    r_tag = right.select(
        *[qcol(c) for c in key_cols],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        payload_struct.alias("__payload"),
    )
    # align schemas for unionByName
    l_tag = l_tag.withColumn("__payload", F.lit(None).cast(r_tag.schema["__payload"].dataType))
    missing_in_right = [c for c in l_tag.columns if c not in r_tag.columns]
    for c in missing_in_right:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))
    both = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # right rows (__side=0) sort before left rows at equal ts -> inclusive;
    # the payload struct as the final sort key makes ties among right rows
    # at an identical ts deterministic (greatest payload wins) instead of
    # partition-order-dependent
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ts", "__side", F.col("__payload"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__payload", ignorenulls=True).over(w)
    out = (
        both.withColumn("__carried", carried)
        .filter(F.col("__side") == 1)
        .drop("__side", "__ts", "__payload")
    )
    out = out.withColumn(f"{payload_prefix}{right_ts}", F.col("__carried.__rts"))
    for c in payload_cols:
        out = out.withColumn(f"{payload_prefix}{c}", F.col("__carried").getField(c))
    return out.drop("__carried")
