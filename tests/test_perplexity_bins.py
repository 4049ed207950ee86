"""CCNet perplexity binning (analytics/lm.py perplexity_bins):
equal-depth bins per language, ordered non-overlapping bin ranges,
short-doc exclusion, validation."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from audit_star_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "documents")


def test_bins_partition_each_language(spark, docs):
    from audit_star_spark.analytics.lm import perplexity_bins

    rows = perplexity_bins(docs, n_bins=3).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bin"]] = r
    n_scorable = docs.filter(
        F.size(F.split(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " "))
        >= 2
    ).count()
    assert sum(r["n_docs"] for r in rows) == n_scorable
    for lang, bins in by_lang.items():
        assert set(bins) <= {1, 2, 3}
        # equal depth: ntile sizes differ by at most 1
        sizes = [bins[b]["n_docs"] for b in sorted(bins)]
        assert max(sizes) - min(sizes) <= 1
        # head has the lowest perplexities; ranges are ordered
        for b in sorted(bins)[:-1]:
            assert bins[b]["ppl_max"] <= bins[b + 1]["ppl_min"]


def test_validation(docs):
    from audit_star_spark.analytics.lm import perplexity_bins

    with pytest.raises(ValueError, match="n_bins"):
        perplexity_bins(docs, n_bins=1)


def test_modes_agree_exactly(spark, docs):
    """The distributed path (gapless_ids two-pass + ntile's closed
    form) must be BIT-IDENTICAL to the window ntile — including the
    uneven-remainder bucket sizes (n_bins=4 over counts not divisible
    by 4 exercises both branches of the closed form)."""
    from audit_star_spark.analytics.lm import perplexity_bins

    for k in (3, 4, 7):
        w = {
            (r["lang"], r["bin"]): (r["n_docs"], r["ppl_min"], r["ppl_max"])
            for r in perplexity_bins(docs, n_bins=k, mode="window").collect()
        }
        d = {
            (r["lang"], r["bin"]): (r["n_docs"], r["ppl_min"], r["ppl_max"])
            for r in perplexity_bins(
                docs, n_bins=k, mode="distributed"
            ).collect()
        }
        assert w == d, k


def test_distributed_mode_has_no_window(spark, docs):
    """A monolingual corpus funnels the window path through one task;
    the distributed path's plan must contain NO window operator (the
    corpus-sized funnel). Scalar-total aggregates (the LM's 1-row
    vocab/total counts, which partial-aggregate map-side first) are the
    only single-partition exchanges allowed — they exist identically in
    both modes and carry one row."""
    from audit_star_spark.analytics.lm import perplexity_bins

    plan = (
        perplexity_bins(docs, n_bins=3, mode="distributed")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "ntile" not in plan
    # every SinglePartition exchange must feed a keyless (scalar)
    # HashAggregate — i.e. a bounded 1-row total, never row data
    import re

    for m in re.finditer(r"Exchange SinglePartition", plan):
        window = plan[max(0, m.start() - 600): m.start()]
        assert "HashAggregate(keys=[]" in window, window[-300:]
