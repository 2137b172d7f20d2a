"""Mass delete by URL regex (sosse-admin delete_documents,
se/management/commands/delete_documents.py) + the Document.delete
cascade (Link doc_to CASCADE / doc_from SET_NULL, se/models.py:43-61):

- regex / --ignore-case / --exclude / --dry-run selection arms,
- frontier rows dropped, (url, collection) identity re-admittable,
- documents payload rows physically removed (partition-pruned
  AppendTable.delete_where compaction — untouched dirs keep their
  files),
- links INTO deleted docs cascade; links FROM deleted docs are kept,
- vacuum reclaims the replaced append dirs.
"""

import os
from datetime import datetime

from sosse_spark.operators.admission import CollectionPolicy
from sosse_spark.sources.webgraph import WebConfig, url_of
from sosse_spark.streaming.crawl_loop import CrawlEngine

T0 = datetime(2024, 1, 1)
WEB = WebConfig(n_docs=30, n_hosts=4)
POL = CollectionPolicy(
    collection_id=1,
    unlimited_regex=r"^http://img[0-9]+\.example\.com/",
    recursion_depth=2,
    keep_params=False,
    recrawl_freq="adaptive",
)


def _urls(spark, eng):
    return {r["url"] for r in eng.frontier.read(spark).select("url").collect()}


def _crawled(spark, eng, rounds=4):
    eng.seed([url_of(2, WEB), url_of(4, WEB), url_of(11, WEB)], T0)
    t = T0
    for _ in range(rounds):
        if eng.run_round(t) is None:
            break
    return eng


def test_dry_run_counts_without_deleting(spark, tmp_root):
    eng = _crawled(spark, CrawlEngine(spark, tmp_root, WEB, POL, n_buckets=4, batch_size=16, per_host_budget=8))
    before = _urls(spark, eng)
    host0 = sorted(u for u in before if u.startswith("http://img0."))
    assert host0
    c = eng.delete_documents(r"^http://img0\.", dry_run=True)
    assert c["selected"] == len(host0)
    assert c["deleted"] == 0 and c["docs_deleted"] == 0
    assert _urls(spark, eng) == before


def test_delete_cascade_and_readmission(spark, tmp_root):
    eng = _crawled(spark, CrawlEngine(spark, tmp_root, WEB, POL, n_buckets=4, batch_size=16, per_host_budget=8))
    before = _urls(spark, eng)
    victims = {u for u in before if u.startswith("http://img0.")}
    assert victims

    docs_before = eng.documents.read(spark)
    doc_urls_before = {r["url"] for r in docs_before.select("url").distinct().collect()}
    links_before = eng.links.read(spark).select("src_url", "dst_url", "is_admitted").collect()
    into_victims = [r for r in links_before if r["dst_url"] in victims]
    from_victims = [
        r for r in links_before if r["src_url"] in victims and r["dst_url"] not in victims
    ]
    assert into_victims, "fixture must have links into the deleted host"

    victim_doc_rows = docs_before.filter(docs_before["url"].isin(list(victims))).count()
    c = eng.delete_documents(r"^http://img0\.")
    assert c["selected"] == len(victims) and c["deleted"] == len(victims)
    assert c["docs_deleted"] == victim_doc_rows
    assert c["links_deleted"] == len(into_victims)

    after = _urls(spark, eng)
    assert after == before - victims

    # documents: no payload row for any victim survives
    doc_urls_after = {r["url"] for r in eng.documents.read(spark).select("url").distinct().collect()}
    assert doc_urls_after == doc_urls_before - victims

    # links INTO victims cascade away; links FROM victims are kept
    links_after = eng.links.read(spark).select("src_url", "dst_url").collect()
    assert not [r for r in links_after if r["dst_url"] in victims]
    kept_from = [r for r in links_after if r["src_url"] in victims]
    assert len(kept_from) == len(from_victims)

    # the vacated identity is re-admittable (bloom superset-safe,
    # exact anti-join falls through) — same guarantee as move_to_collection
    seed_back = sorted(victims)[0]
    eng.seed([seed_back], T0)
    assert seed_back in _urls(spark, eng)

    # idempotent re-run completes with nothing left to do
    eng2 = CrawlEngine(spark, tmp_root, WEB, POL, n_buckets=4, batch_size=16, per_host_budget=8)
    c2 = eng2.delete_documents(r"^http://img0\.", exclude=seed_back.replace(".", r"\."))
    assert c2["selected"] == 0


def test_ignore_case_and_exclude_arms(spark, tmp_root):
    eng = _crawled(spark, CrawlEngine(spark, tmp_root, WEB, POL, n_buckets=4, batch_size=16, per_host_budget=8))
    before = _urls(spark, eng)
    host1 = {u for u in before if u.startswith("http://img1.")}
    assert host1
    # upper-cased pattern only matches with ignore_case
    c = eng.delete_documents(r"^HTTP://IMG1\.", dry_run=True)
    assert c["selected"] == 0
    c = eng.delete_documents(r"^HTTP://IMG1\.", ignore_case=True, dry_run=True)
    assert c["selected"] == len(host1)
    # exclude carves one url back out (same case mode applies to it)
    keep = sorted(host1)[0]
    c = eng.delete_documents(
        r"^HTTP://IMG1\.", ignore_case=True, exclude=keep.replace(".", r"\.").upper()
    )
    assert c["selected"] == len(host1) - 1
    after = _urls(spark, eng)
    assert keep in after and not (host1 - {keep}) & after


def test_delete_where_partition_pruned_compaction(spark, tmp_root):
    """Only append dirs containing hits rewrite; others keep their
    files byte-for-byte, and vacuum reclaims the replaced dirs."""
    eng = _crawled(spark, CrawlEngine(spark, tmp_root, WEB, POL, n_buckets=4, batch_size=16, per_host_budget=8))
    doc_dir = os.path.join(tmp_root, "documents")
    entries_before = {
        e["dir"]: e for e in eng.documents._entries(eng.documents.manifest())
    }
    assert len(entries_before) >= 2, "need multiple append dirs for the pruning claim"
    # victims drawn from ONE round's append dir: pick the urls of the
    # last round only
    docs = eng.documents.read(spark)
    last_round = docs.agg({"round_no": "max"}).collect()[0][0]
    last_urls = {r["url"] for r in docs.filter(f"round_no = {last_round}").select("url").collect()}
    only_last = last_urls - {
        r["url"] for r in docs.filter(f"round_no < {last_round}").select("url").collect()
    }
    if not only_last:
        import pytest

        pytest.skip("fixture produced no last-round-only urls")
    n_before = docs.count()
    keys = spark.createDataFrame([(u,) for u in sorted(only_last)], "url string")
    mtimes_before = {
        d: os.path.getmtime(os.path.join(doc_dir, d)) for d in entries_before
    }
    res = eng.documents.delete_where(spark, keys, ["url"])
    assert res["rows_deleted"] == len(only_last)
    entries_after = {e["dir"]: e for e in eng.documents._entries(eng.documents.manifest())}
    untouched = set(entries_before) & set(entries_after)
    assert untouched, "most dirs must survive untouched"
    for d in untouched:
        assert os.path.getmtime(os.path.join(doc_dir, d)) == mtimes_before[d]
    rewritten = set(entries_after) - set(entries_before)
    assert all(d.startswith("rewrite-") for d in rewritten)
    # round tags preserved on rewritten entries
    for d in rewritten:
        assert entries_after[d]["round"] == last_round
    # no victim row survives; all other rows intact
    after = eng.documents.read(spark)
    assert after.filter(after["url"].isin(list(only_last))).count() == 0
    assert after.count() == n_before - len(only_last)
    # vacuum removes the replaced original dir(s)
    removed = eng.documents.vacuum()
    replaced = set(entries_before) - set(entries_after)
    assert replaced <= set(removed)
    assert eng.documents.read(spark).count() == n_before - len(only_last)


def test_delete_where_twice_nested_rewrite(spark, tmp_root):
    """A second delete over an already-rewritten dir must find and
    rewrite the nested entry (rel-path dir identity, not name prefix)."""
    eng = _crawled(spark, CrawlEngine(spark, tmp_root, WEB, POL, n_buckets=4, batch_size=16, per_host_budget=8))
    docs = eng.documents.read(spark)
    urls = sorted({r["url"] for r in docs.select("url").collect()})
    assert len(urls) >= 3
    k1 = spark.createDataFrame([(urls[0],)], "url string")
    k2 = spark.createDataFrame([(urls[1],)], "url string")
    n0 = docs.count()
    r1 = eng.documents.delete_where(spark, k1, ["url"])
    assert r1["rows_deleted"] >= 1
    r2 = eng.documents.delete_where(spark, k2, ["url"])
    assert r2["rows_deleted"] >= 1
    left = eng.documents.read(spark)
    assert left.count() == n0 - r1["rows_deleted"] - r2["rows_deleted"]
    assert left.filter(left["url"].isin(urls[:2])).count() == 0


def test_crash_between_frontier_and_cascade_repaired_by_rerun(spark, tmp_root, monkeypatch):
    """Crash matrix for the delete: the frontier half commits, then the
    process dies before (a) the documents compaction or (b) the links
    compaction.  Re-running the SAME delete selects 0 frontier rows but
    must still complete the payload cascade — the cascade set is
    derived from the payload logs, not from the frontier selection."""
    import pytest as _pytest

    from sosse_spark.sources.tables import AppendTable

    eng = _crawled(spark, CrawlEngine(spark, tmp_root, WEB, POL, n_buckets=4, batch_size=16, per_host_budget=8))
    victims = {u for u in _urls(spark, eng) if u.startswith("http://img0.")}
    assert victims
    docs_rows = eng.documents.read(spark)
    victim_doc_rows = docs_rows.filter(docs_rows["url"].isin(list(victims))).count()
    assert victim_doc_rows > 0

    # crash point (a): frontier committed, BOTH compactions lost
    orig = AppendTable.delete_where

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before payload cascade")

    monkeypatch.setattr(AppendTable, "delete_where", boom)
    with _pytest.raises(RuntimeError):
        eng.delete_documents(r"^http://img0\.")
    monkeypatch.setattr(AppendTable, "delete_where", orig)

    assert not {u for u in _urls(spark, eng) if u in victims}, "frontier half must have committed"
    d = eng.documents.read(spark)
    assert d.filter(d["url"].isin(list(victims))).count() == victim_doc_rows, "payload orphaned"

    c = eng.delete_documents(r"^http://img0\.")
    assert c["selected"] == 0 and c["deleted"] == 0
    assert c["docs_deleted"] == victim_doc_rows, "re-run must complete the cascade"
    d = eng.documents.read(spark)
    assert d.filter(d["url"].isin(list(victims))).count() == 0
    l = eng.links.read(spark)
    assert l.filter(l["dst_url"].isin(list(victims))).count() == 0

    # crash point (b): docs compaction done, links compaction lost —
    # delete another host, failing only the SECOND delete_where call
    victims2 = {u for u in _urls(spark, eng) if u.startswith("http://img1.")}
    assert victims2
    calls = {"n": 0}

    def boom_second(self, *a, **k):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected crash before links cascade")
        return orig(self, *a, **k)

    monkeypatch.setattr(AppendTable, "delete_where", boom_second)
    with _pytest.raises(RuntimeError):
        eng.delete_documents(r"^http://img1\.")
    monkeypatch.setattr(AppendTable, "delete_where", orig)

    l = eng.links.read(spark)
    orphan_links = l.filter(l["dst_url"].isin(list(victims2)) & l["is_admitted"]).count()
    assert orphan_links > 0, "links half must still be pending"
    c2 = eng.delete_documents(r"^http://img1\.")
    assert c2["selected"] == 0 and c2["links_deleted"] >= orphan_links
    l = eng.links.read(spark)
    assert l.filter(l["dst_url"].isin(list(victims2))).count() == 0
    # a fully-repaired state re-runs as a no-op
    c3 = eng.delete_documents(r"^http://img[01]\.")
    assert c3 == {"selected": 0, "deleted": 0, "docs_deleted": 0, "links_deleted": 0}
