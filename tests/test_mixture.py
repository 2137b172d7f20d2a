"""Corpus mixing: temperature-based source re-weighting (Conneau &
Lample 2019 §3.1 / XLM-R; Pile-style mixture weights) and the
deterministic md5-keyed resampler.  Factors are hand-verified on a
power-of-two corpus (exact doubles); the resampler is compared against
a hashlib replica of its digest rule."""

import hashlib

from pyspark.sql import functions as F

from sosse_spark.operators.sampling import mixture_resample, temperature_weights


def _corpus(spark):
    rows = []
    i = 0
    for src, n in (("a", 1), ("b", 4), ("c", 16)):
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id int, source string")


def test_temperature_weights_hand_values(spark):
    docs = _corpus(spark)
    w = {r["source"]: r for r in temperature_weights(docs, alpha=0.5).collect()}
    # sqrt(n) = 1, 2, 4; Z = 7; N = 21
    # factor_i = (sqrt(n_i)/Z) * N / n_i
    assert w["a"]["n"] == 1 and abs(w["a"]["factor"] - 3.0) < 1e-12
    assert w["b"]["n"] == 4 and abs(w["b"]["factor"] - 1.5) < 1e-12
    assert w["c"]["n"] == 16 and abs(w["c"]["factor"] - 0.75) < 1e-12
    # alpha=1 is the identity mixture: every factor exactly 1
    for r in temperature_weights(docs, alpha=1.0).collect():
        assert abs(r["factor"] - 1.0) < 1e-12
    # expected output size == input size (sum factor_i * n_i = N)
    tot = sum(r["factor"] * r["n"] for r in temperature_weights(docs, alpha=0.5).collect())
    assert abs(tot - 21.0) < 1e-9


def _ref_reps(doc_id: int, factor: float, seed: int = 42) -> int:
    u = int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8], 16) / 2**32
    base = int(factor // 1)
    return base + (1 if u < factor - base else 0)


def test_mixture_resample_matches_digest_replica(spark):
    docs = _corpus(spark)
    factors = temperature_weights(docs, alpha=0.5)
    out = mixture_resample(docs, factors).collect()
    fmap = {r["source"]: r["factor"] for r in factors.collect()}
    want = {}
    for r in docs.collect():
        reps = _ref_reps(r["doc_id"], fmap[r["source"]])
        if reps:
            want[r["doc_id"]] = reps
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["copy_no"])
    assert {k: len(v) for k, v in got.items()} == want
    # copy_no is dense 0..reps-1
    for k, v in got.items():
        assert v == set(range(len(v)))
    # integer factor 3.0 -> source 'a' docs emit exactly 3 copies each
    # (u < 0 never fires)
    assert all(len(got[r["doc_id"]]) == 3 for r in docs.filter("source = 'a'").collect())
    # determinism: a second run is identical
    again = mixture_resample(docs, factors).collect()
    assert sorted((r["doc_id"], r["copy_no"]) for r in again) == sorted(
        (r["doc_id"], r["copy_no"]) for r in out
    )


def test_mixture_resample_zero_factor_drops(spark):
    docs = _corpus(spark)
    factors = spark.createDataFrame(
        [("a", 0.0), ("b", 2.0), ("c", 0.0)], "source string, factor double"
    )
    out = mixture_resample(docs, factors)
    assert out.filter("source <> 'b'").count() == 0
    assert out.filter("source = 'b'").count() == 8  # 4 docs x 2 copies


def test_mixture_resample_no_shuffle_plan(spark):
    """factors broadcast + narrow Generate: no Exchange in the resample
    itself (the factor computation aggregates separately)."""
    docs = _corpus(spark)
    factors = spark.createDataFrame([("a", 1.5), ("b", 1.0), ("c", 0.5)], "source string, factor double")
    plan = mixture_resample(docs, factors)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", "BCX")
    assert "Generate" in plan
