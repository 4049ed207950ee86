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
