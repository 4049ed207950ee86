"""Corpus snapshot diff (analytics/snapshot.py): classification and
per-source counts on a planted two-snapshot pair. Engine parity is
locked by test_oracle_parity (snapshot_diff gate query)."""

from pyspark.sql import functions as F


def test_snapshot_diff_classification(spark):
    from audit_star_spark.analytics.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "alpha beta", "web"),
            (2, "gamma delta", "web"),
            (3, "kept as is", "books"),
            (4, "will vanish", "books"),
            (5, "Whitespace   Only\tchange", "web"),
        ],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha beta EDITED", "web"),     # changed
            (2, "gamma delta", "web"),           # unchanged
            (3, "kept as is", "books"),          # unchanged
            (5, "whitespace only change", "web"),  # normalizes equal
            (6, "brand new", "news"),            # added
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r
        for r in snapshot_diff(old, new).collect()
    }
    assert got["web"]["n_changed"] == 1      # doc 1
    assert got["web"]["n_unchanged"] == 2    # docs 2, 5 (normalized)
    assert got["web"]["n_added"] == 0 and got["web"]["n_removed"] == 0
    assert got["books"]["n_removed"] == 1    # doc 4
    assert got["books"]["n_unchanged"] == 1  # doc 3
    assert got["news"]["n_added"] == 1       # doc 6
    assert got["web"]["n_old"] == 3 and got["web"]["n_new"] == 3
    assert got["news"]["n_old"] == 0 and got["news"]["n_new"] == 1


def test_snapshot_diff_source_move_counts_under_new_home(spark):
    from audit_star_spark.analytics.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same text", "web")], "doc_id long, text string, source string"
    )
    new = spark.createDataFrame(
        [(1, "same text", "books")], "doc_id long, text string, source string"
    )
    rows = {r["source"]: r for r in snapshot_diff(old, new).collect()}
    # metadata-only move: unchanged, attributed to the NEW source
    assert set(rows) == {"books"}
    assert rows["books"]["n_unchanged"] == 1 and rows["books"]["n_changed"] == 0


def test_null_text_doc_is_not_misclassified(spark):
    """md5(NULL) must not NULL-propagate into presence: a NULL-text doc
    in both snapshots is 'unchanged' (hashes like ''), and NULL -> text
    counts as changed."""
    from audit_star_spark.analytics.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, "web"), (2, None, "web"), (3, "", "web")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(1, None, "web"), (2, "now has text", "web"), (3, None, "web")],
        "doc_id long, text string, source string",
    )
    row = snapshot_diff(old, new).collect()[0]
    assert row["n_added"] == 0 and row["n_removed"] == 0
    assert row["n_changed"] == 1      # doc 2: NULL -> text
    assert row["n_unchanged"] == 2    # doc 1 (NULL==NULL), doc 3 (''==NULL)
