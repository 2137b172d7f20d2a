"""UniMax language-budget allocation (Chung et al. 2023,
arXiv:2304.09151 Algorithm 1): the relational closed form must match a
literal pure-Python replica of the paper's sequential loop, including
the capped/uncapped split, on skewed, uniform, and degenerate inputs;
allocations compose with mixture_resample via epochs-as-factor."""

import pytest
from pyspark.sql import functions as F

from sosse_spark.operators.sampling import mixture_resample, unimax_allocation


def _unimax_loop(sizes: dict, budget: float, max_epochs: float) -> dict:
    """Verbatim replica of the paper's Algorithm 1: ascending by size,
    each language takes min(size*N, remaining/remaining_langs)."""
    out = {}
    remaining = budget
    langs = sorted(sizes, key=lambda l: (sizes[l], l))
    for i, lang in enumerate(langs):
        share = remaining / (len(langs) - i)
        alloc = min(sizes[lang] * max_epochs, share)
        out[lang] = alloc
        remaining -= alloc
    return out


def _docs_from_sizes(spark, sizes: dict):
    rows = []
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang, 1))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, w int")


@pytest.mark.parametrize(
    "sizes,budget,epochs",
    [
        ({"en": 600, "fr": 200, "de": 100, "rm": 100}, 2000.0, 3.0),  # mixed
        ({"a": 10, "b": 10, "c": 10}, 90.0, 3.0),  # all capped exactly
        ({"a": 10, "b": 10, "c": 10}, 15.0, 3.0),  # all uncapped (tiny budget)
        ({"a": 1, "b": 1000}, 500.0, 4.0),  # extreme skew
        ({"solo": 50}, 1000.0, 2.0),  # one language
        ({"x": 5, "y": 5}, 0.0, 3.0),  # zero budget
    ],
)
def test_unimax_matches_paper_loop(spark, sizes, budget, epochs):
    docs = _docs_from_sizes(spark, sizes)
    got = {
        r.lang: r.allocation
        for r in unimax_allocation(
            docs, total_budget=budget, max_epochs=epochs, weight_col="w"
        ).collect()
    }
    want = _unimax_loop(sizes, budget, epochs)
    assert set(got) == set(want)
    for lang in want:
        assert got[lang] == pytest.approx(want[lang], abs=1e-6), lang


def test_unimax_uncapped_share_is_uniform(spark):
    # once one language is uncapped, every larger one takes the SAME share
    docs = _docs_from_sizes(spark, {"a": 10, "big1": 500, "big2": 700, "big3": 900})
    rows = unimax_allocation(docs, total_budget=1000.0, max_epochs=2.0, weight_col="w").collect()
    uncapped = sorted(r.allocation for r in rows if not r.capped)
    assert len(uncapped) == 3
    assert max(uncapped) - min(uncapped) < 1e-9
    capped = [r for r in rows if r.capped]
    assert [(r.lang, r.allocation) for r in capped] == [("a", 20.0)]


def test_unimax_epochs_never_exceed_cap(spark):
    docs = _docs_from_sizes(spark, {"en": 300, "fr": 30, "de": 3})
    for r in unimax_allocation(docs, total_budget=5000.0, max_epochs=4.0, weight_col="w").collect():
        assert r.epochs <= 4.0 + 1e-9


def test_unimax_corpus_epochs_budget(spark):
    # budget_corpus_epochs keeps the total allocation at 2x corpus size
    # when nothing caps below it
    docs = _docs_from_sizes(spark, {"a": 100, "b": 100})
    rows = unimax_allocation(
        docs, budget_corpus_epochs=2.0, max_epochs=3.0, weight_col="w"
    ).collect()
    assert sum(r.allocation for r in rows) == pytest.approx(400.0)


def test_unimax_param_validation(spark):
    docs = _docs_from_sizes(spark, {"a": 1})
    with pytest.raises(ValueError):
        unimax_allocation(docs)
    with pytest.raises(ValueError):
        unimax_allocation(docs, total_budget=1.0, budget_corpus_epochs=1.0)


def test_unimax_count_weight_default(spark):
    # weight_col=None counts rows
    docs = _docs_from_sizes(spark, {"a": 4, "b": 8})
    got = {r.lang: r.size for r in unimax_allocation(docs, total_budget=100.0).collect()}
    assert got == {"a": 4, "b": 8}


def test_unimax_feeds_mixture_resample(spark):
    docs = _docs_from_sizes(spark, {"en": 60, "rm": 10})
    alloc = unimax_allocation(docs, total_budget=100.0, max_epochs=3.0, weight_col="w")
    factors = alloc.select("lang", F.col("epochs").alias("factor"))
    out = mixture_resample(docs, factors, source_col="lang")
    # rm caps at 3 epochs → every rm doc repeats exactly 3x
    rm = out.filter(F.col("lang") == "rm").groupBy("doc_id").count().collect()
    assert all(r["count"] == 3 for r in rm)
    # en shares the remainder: 70/60 epochs → 10 docs repeat twice
    en_total = out.filter(F.col("lang") == "en").count()
    per_doc = {r.doc_id: r["count"] for r in
               out.filter(F.col("lang") == "en").groupBy("doc_id").count().collect()}
    assert set(per_doc.values()) <= {1, 2}
    assert en_total == sum(per_doc.values())
