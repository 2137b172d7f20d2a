"""Differential fuzz for the closing-session operators: domain_page_cap
vs a literal Python replica of the quota rule (random frontier shapes,
skewed domains, cap sweep), and sq_topk vs brute_force_topk over random
dims/sizes/shortlists (the exact-equality contract the oracle certifies
at one configuration, swept here across several)."""

import random
from datetime import datetime, timedelta


def _py_quota(rows, cap):
    """rows: (domain, id, manual, crawl_last, crawl_next).  Returns the
    admitted pending id set + per-domain crawled counts."""
    crawled = {}
    for d, _id, m, cl, cn in rows:
        if cl is not None:
            crawled[d] = crawled.get(d, 0) + 1
    admitted = {}
    by_dom = {}
    for d, _id, m, cl, cn in rows:
        if cl is None:
            by_dom.setdefault(d, []).append((m, cn, _id))
    for d, pend in by_dom.items():
        # priority: manual DESC, (crawl_last all NULL — tie), crawl_next
        # ASC NULLS LAST, id ASC
        pend.sort(key=lambda t: (not t[0], t[1] is None, t[1] or datetime.min, t[2]))
        quota = max(cap - crawled.get(d, 0), 0)
        for rank, (m, cn, _id) in enumerate(pend, start=1):
            if rank <= quota:
                admitted[_id] = (rank, crawled.get(d, 0))
    return admitted, crawled


def test_domain_page_cap_fuzz_vs_replica(spark):
    from sosse_spark.operators.scheduler import domain_page_cap

    rng = random.Random(77)
    t0 = datetime(2024, 1, 1)
    for trial, cap in [(0, 1), (1, 3), (2, 7)]:
        rows = []
        for i in range(rng.randint(20, 60)):
            d = f"d{rng.randint(0, 4)}.com"
            crawled = rng.random() < 0.5
            rows.append(
                (
                    d,
                    i,
                    rng.random() < 0.2,
                    t0 if crawled else None,
                    None if rng.random() < 0.15 else t0 + timedelta(hours=rng.randint(0, 48)),
                )
            )
        df = spark.createDataFrame(
            rows,
            "url_domain string, id long, manual_crawl boolean, "
            "crawl_last timestamp, crawl_next timestamp",
        )
        out = domain_page_cap(df, cap=cap).collect()
        got_admitted = {
            r["id"]: (r["pending_rank"], r["domain_crawled"])
            for r in out
            if r["pending_rank"] is not None
        }
        got_crawled = [r for r in out if r["pending_rank"] is None]
        want_admitted, want_crawled = _py_quota(rows, cap)
        assert got_admitted == want_admitted, f"trial {trial}"
        assert len(got_crawled) == sum(want_crawled.values())
        for r in got_crawled:
            assert r["domain_crawled"] == want_crawled[r["url_domain"]]


def test_sq8_exactness_fuzz_configs(spark):
    """SQ8 == exact top-k across random (n, dim, k, shortlist) configs —
    the single-config oracle claim, swept."""
    import numpy as np

    from sosse_spark.operators.similarity import brute_force_topk, sq_topk, sq_train

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(40, 120))
        dim = int(rng.choice([4, 8, 16]))
        k = int(rng.integers(2, 6))
        vecs = rng.standard_normal((n, dim))
        # plant exact duplicates to force quantized-score ties at cuts
        vecs[n - 1] = vecs[0]
        vecs[n - 2] = vecs[1]
        emb = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        q = emb.filter("vec_id < 2").selectExpr("vec_id as query_id", "embedding")
        bounds = sq_train(emb)
        got = sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["cos_sim"])
            for r in sq_topk(emb, q, bounds, k=k, shortlist_mult=8).collect()
        )
        want = sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["cos_sim"])
            for r in brute_force_topk(emb, q, k=k).collect()
        )
        assert got == want, f"trial {trial}: n={n} dim={dim} k={k}"
