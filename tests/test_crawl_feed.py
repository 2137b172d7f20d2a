"""Feed-mode e2e: a web where every third doc serves an RSS/Atom feed
(entries = the same out-links) must produce EXACTLY the html_mode crawl's
frontier and link graph — the feedparse re-render (se/document.py:327-345)
is just another page rendering to the engine."""

from datetime import datetime, timedelta

from sosse_spark.functions.urlnorm import absolutize_url
from sosse_spark.operators.admission import CollectionPolicy
from sosse_spark.sources.corpus import caption_for
from sosse_spark.sources.webgraph import (
    WebConfig,
    feed_page,
    out_links,
    serves_feed,
    url_of,
)
from sosse_spark.streaming.crawl_loop import CrawlEngine

T0 = datetime(2024, 1, 1)
WEB_H = WebConfig(n_docs=24, n_hosts=3, html_mode=True)
WEB_F = WebConfig(n_docs=24, n_hosts=3, html_mode=True, feed_every=3)
POLICY = CollectionPolicy(
    collection_id=1,
    unlimited_regex=r"^http://img[0-9]+\.example\.com/",
    recursion_depth=2,
    keep_params=False,
    recrawl_freq="adaptive",
)


def test_fetch_row_feed_payload():
    """Unit: a feed doc's fetch row — feed title becomes the page title,
    entry links resolve exactly like the html anchors."""
    from sosse_spark.operators.fetch import _fetch_row

    i = 15  # 15 % 3 == 0 -> feed (atom: odd i); 3 out-links
    assert serves_feed(i, WEB_F)
    url = url_of(i, WEB_F)
    row = _fetch_row(url, WEB_F, None)
    assert row["fmt"] == "html"
    assert row["bytes"].startswith(b"<!DOCTYPE html>")  # the RE-RENDERED page is stored
    assert row["title"] == caption_for(i)
    # links: [h2 feed self-link] + entries, base-resolved like anchors
    assert row["links"][0] == url
    expected = [absolutize_url(url, h) for h in out_links(i, WEB_F)]
    assert row["links"][1:] == expected


def test_fetch_row_empty_feed_falls_through():
    """A zero-entry feed is NOT a feed (reference early return): the raw
    XML takes the HTML path and yields no links."""
    from sosse_spark.operators.fetch import _fetch_row

    i = 12  # 12 % 3 == 0 -> feed doc, 12 % 4 == 0 -> zero out-links
    assert serves_feed(i, WEB_F) and out_links(i, WEB_F) == []
    row = _fetch_row(url_of(i, WEB_F), WEB_F, None)
    assert row["links"] == []
    assert row["bytes"].startswith(b"<rss") or row["bytes"].startswith(b"<feed")


def test_feed_page_is_wellformed_for_both_grammars():
    from sosse_spark.operators.feedparse import parse_feed

    for i in (3, 6, 9, 15, 18, 21):  # mixed rss/atom, 1-3 entries
        if not out_links(i, WEB_F):
            continue
        parsed = parse_feed(feed_page(i, WEB_F, caption_for(i)))
        assert parsed is not None
        assert parsed["kind"] == ("rss" if i % 2 == 0 else "atom")
        assert [e["link"] for e in parsed["entries"]] == out_links(i, WEB_F)


def _crawl(spark, root, web, max_rounds=8):
    eng = CrawlEngine(spark, root, web, POLICY, n_buckets=4, batch_size=32, per_host_budget=8)
    eng.seed([url_of(2, web), url_of(15, web), url_of(11, web)], T0)
    eng.run_until_quiescent(T0, timedelta(minutes=1), max_rounds=max_rounds)
    return eng


def test_feed_mode_crawl_matches_html_mode(spark, tmp_path_factory):
    eng_h = _crawl(spark, str(tmp_path_factory.mktemp("html")), WEB_H)
    eng_f = _crawl(spark, str(tmp_path_factory.mktemp("feed")), WEB_F)

    fh = eng_h.frontier.read(spark).select("url", "error", "robotstxt_rejected").collect()
    ff = eng_f.frontier.read(spark).select("url", "error", "robotstxt_rejected").collect()
    assert {(r["url"], r["error"], r["robotstxt_rejected"]) for r in fh} == {
        (r["url"], r["error"], r["robotstxt_rejected"]) for r in ff
    }
    assert len(fh) == len(ff)

    lh = {(r["src_url"], r["dst_url"], r["link_no"]) for r in eng_h.links_view().collect()}
    lf = {(r["src_url"], r["dst_url"], r["link_no"]) for r in eng_f.links_view().collect()}
    assert lh == lf
    assert lf  # non-trivial graph

    # feed docs carry the feed title (== corpus caption) through documents
    fdocs = {r["url"]: r for r in eng_f.documents.read(spark).collect()}
    seen_feed_doc = False
    for i in range(24):
        u = url_of(i, WEB_F)
        if u in fdocs and serves_feed(i, WEB_F) and out_links(i, WEB_F):
            assert fdocs[u]["title"] == caption_for(i)
            seen_feed_doc = True
    assert seen_feed_doc
