"""Corpus snapshot diff — incremental corpus versioning.

Training corpora are rebuilt continuously (recrawls, license removals,
pipeline re-runs); before shipping snapshot N+1 the first question is
always "what actually changed vs N?". This operator classifies every
document across two snapshots by key and content hash:

    added      doc_id only in the new snapshot
    removed    doc_id only in the old snapshot
    changed    doc_id in both, normalized-text md5 differs
    unchanged  doc_id in both, hash equal

and reports counts per source (the granularity release notes are cut
at). The content hash is md5 over the whitespace-normalized lowercased
text — the same normalization the exact-dedup operator keys on, so
"changed" means changed AFTER the cleaning the pipeline would apply
anyway, not a whitespace diff.

100 TB shape: one scan of each snapshot projecting (doc_id, source,
hash) — the hash is in-row, whole-stage codegen — then ONE full outer
join shuffled on doc_id (the join key is the primary key: no skew, AQE
handles stragglers) and a partial-aggregated per-source rollup. Nothing
driver-side, no all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """Per-source change census between two corpus snapshots.

    Returns (source, n_added, n_removed, n_changed, n_unchanged,
    n_old, n_new) sorted by the caller. ``source`` for an added doc
    comes from the new snapshot, for a removed doc from the old one,
    for survivors from the new snapshot (a doc whose source column
    itself moved counts under its new home — and as ``changed`` only
    if its text changed too; source is metadata, not content).

    NULL text hashes like '' (COALESCE before normalizing): presence is
    keyed on the ROW existing, never on the text being non-NULL — an
    md5(NULL) would NULL-propagate and misclassify a NULL-text survivor
    as added."""
    h = F.md5(
        F.regexp_replace(
            F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+", " "
        )
    )
    o = old_docs.select(
        "doc_id", F.col("source").alias("src_old"), h.alias("h_old")
    )
    n = new_docs.select(
        "doc_id", F.col("source").alias("src_new"), h.alias("h_new")
    )
    j = o.join(n, "doc_id", "full_outer").select(
        F.coalesce("src_new", "src_old").alias("source"),
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
        .otherwise("unchanged")
        .alias("state"),
        F.col("h_old").isNotNull().alias("in_old"),
        F.col("h_new").isNotNull().alias("in_new"),
    )
    return j.groupBy("source").agg(
        F.sum((F.col("state") == "added").cast("long")).alias("n_added"),
        F.sum((F.col("state") == "removed").cast("long")).alias("n_removed"),
        F.sum((F.col("state") == "changed").cast("long")).alias("n_changed"),
        F.sum((F.col("state") == "unchanged").cast("long")).alias(
            "n_unchanged"
        ),
        F.sum(F.col("in_old").cast("long")).alias("n_old"),
        F.sum(F.col("in_new").cast("long")).alias("n_new"),
    )
