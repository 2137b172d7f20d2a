"""CCNet perplexity tertile bucketing (functions/text.ccnet_ppl_buckets):
golden replication of the interpolated-bigram score + quantized integer
ECDF cut over a hand-built corpus, plus edge arms (tie-group atomicity,
<2-token drop).  Oracle parity at sf0.001 runs in test_entry_oracle."""

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from sosse_spark.functions.text import ccnet_ppl_buckets

LAM = 0.7

DOCS = [
    # lang "aa": six docs spanning common-bigram to rare-token mixes
    (1, "aa", "the cat sat on the mat and the cat sat again"),
    (2, "aa", "the cat sat on the mat"),
    (3, "aa", "the dog ran over the hill"),
    (4, "aa", "quux zorb flib the cat"),
    (5, "aa", "zzyx qwfp vbnm lkjh"),
    (6, "aa", "the cat the cat the cat"),
    # lang "bb": three docs — n=3 makes the cuts cum<=1 / cum<=2
    (7, "bb", "red green blue red green"),
    (8, "bb", "red green blue"),
    (9, "bb", "violet umber"),
    # tie group: identical text to doc 3 -> identical score/bin/bucket
    (10, "aa", "the dog ran over the hill"),
    # single-token doc: no pairs, must drop out
    (11, "aa", "lonely"),
]


def _round_half_up(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _golden():
    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        for i, _, text in DOCS
    }
    c1 = Counter(t for l in toks.values() for t in l)
    total = sum(c1.values())
    c2 = Counter(
        (l[j], l[j + 1]) for l in toks.values() for j in range(len(l) - 1)
    )
    scored = {}
    for i, lang, _ in DOCS:
        l = toks[i]
        if len(l) < 2:
            continue
        nlls = [
            -math.log(
                LAM * c2[(a, b)] / c1[a] + (1 - LAM) * c1[b] / total
            )
            for a, b in zip(l, l[1:])
        ]
        avg = sum(nlls) / len(nlls)
        scored[i] = (
            lang,
            _round_half_up(avg, 6),
            _round_half_up(math.exp(avg), 4),
        )
    rows = {}
    for i, (lang, avg_nll, ppl) in scored.items():
        rows[i] = [lang, avg_nll, ppl, math.floor(avg_nll * 100)]
    # integer ECDF over centi-NLL bins, per language
    langs = {lang for lang, _, _ in scored.values()}
    for lang in langs:
        members = {i: r for i, r in rows.items() if r[0] == lang}
        n = len(members)
        bins = sorted({r[3] for r in members.values()})
        cum, cums = 0, {}
        for b in bins:
            cum += sum(1 for r in members.values() if r[3] == b)
            cums[b] = cum
        for i, r in members.items():
            c = cums[r[3]]
            bucket = "head" if c * 3 <= n else ("middle" if c * 3 <= 2 * n else "tail")
            rows[i] = tuple(r) + (bucket,)
    return rows


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    got = ccnet_ppl_buckets(df, lam=LAM)
    assert got.columns == ["doc_id", "lang", "avg_nll", "ppl", "nll_bin", "bucket"]
    return {r["doc_id"]: r for r in got.collect()}


def test_golden_replication(spark):
    got = _run(spark)
    want = _golden()
    assert set(got) == set(want)
    for i, (lang, avg_nll, ppl, nll_bin, bucket) in want.items():
        r = got[i]
        assert r["lang"] == lang, i
        assert abs(r["avg_nll"] - avg_nll) < 1e-9, i
        assert abs(r["ppl"] - ppl) < 1e-9, i
        assert r["nll_bin"] == nll_bin, i
        assert r["bucket"] == bucket, i


def test_edge_arms(spark):
    got = _run(spark)
    # the single-token doc has no pairs and drops out
    assert 11 not in got
    # identical texts land in the same bin with the same bucket (atomic
    # tie groups — the ECDF counts the whole group before cutting)
    assert got[3]["nll_bin"] == got[10]["nll_bin"]
    assert got[3]["bucket"] == got[10]["bucket"]
    # buckets are monotone in score within a language
    for lang in ("aa", "bb"):
        order = {"head": 0, "middle": 1, "tail": 2}
        rs = sorted(
            (r for r in got.values() if r["lang"] == lang),
            key=lambda r: (r["avg_nll"], r["doc_id"]),
        )
        seq = [order[r["bucket"]] for r in rs]
        assert seq == sorted(seq), (lang, seq)
    # every language with >= 3 scored docs populates a non-tail bucket
    aa = [r["bucket"] for r in got.values() if r["lang"] == "aa"]
    assert "tail" in aa and ("head" in aa or "middle" in aa)
