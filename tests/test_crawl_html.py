"""html_mode e2e: the crawl engine over REAL HTML pages (P2 DOM walk in
the fetch stage) must reproduce the synthetic graft's crawl exactly —
same frontier membership, same link graph — while carrying parsed
title/text.  Mirrors the e2e strategy of se/test_crawl.py over a web
whose pages exercise base-href, nav suppression, and mixed
absolute/relative href forms."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from sosse_spark.functions.urlnorm import absolutize_url
from sosse_spark.operators.admission import CollectionPolicy
from sosse_spark.sources.corpus import caption_for
from sosse_spark.sources.webgraph import WebConfig, html_page, out_links, url_of
from sosse_spark.streaming.crawl_loop import CrawlEngine

T0 = datetime(2024, 1, 1)
WEB_S = WebConfig(n_docs=24, n_hosts=3)
WEB_H = WebConfig(n_docs=24, n_hosts=3, html_mode=True)
POLICY = CollectionPolicy(
    collection_id=1,
    unlimited_regex=r"^http://img[0-9]+\.example\.com/",
    recursion_depth=2,
    keep_params=False,
    recrawl_freq="adaptive",
)
SEEDS = [url_of(2, WEB_S), url_of(15, WEB_S), url_of(11, WEB_S)]


def test_fetch_row_html_payload():
    """Unit: one html_mode fetch — parsed payload shape (no Spark)."""
    from sosse_spark.operators.fetch import _fetch_row

    i = 15  # 3-link page, not a base page (15 % 5 == 0)
    url = url_of(i, WEB_H)
    row = _fetch_row(url, WEB_H, None)
    assert row["fmt"] == "html"
    assert row["bytes"].startswith(b"<html")
    assert row["title"] == caption_for(i)
    # content text: title div first (nav suppressed), then anchor texts
    assert row["caption"].startswith(caption_for(i) + "\n")
    assert "link 0" in row["caption"] and "site menu" not in row["caption"]
    # links: [nav self] + out_links, already base-resolved
    assert row["links"][0] == url
    expected = [absolutize_url(url, h) for h in out_links(i, WEB_H)]
    assert row["links"][1:] == expected
    assert row["phash"] is None and row["w"] is None


def test_fetch_row_html_base_page():
    """A base page (i%5==2) carries <base>; the self-base keeps
    resolution identical to the synthetic graph."""
    from sosse_spark.operators.fetch import _fetch_row

    i = 22
    url = url_of(i, WEB_H)
    assert b"<base" in html_page(i, WEB_H, "t").encode()
    row = _fetch_row(url, WEB_H, None)
    expected = [absolutize_url(url, h) for h in out_links(i, WEB_H)]
    assert row["links"][1:] == expected


def _crawl(spark, root, web, max_rounds=8, extra_seeds=()):
    eng = CrawlEngine(spark, root, web, POLICY, n_buckets=4, batch_size=32, per_host_budget=8)
    eng.seed([url_of(2, web), url_of(15, web), url_of(11, web), *extra_seeds], T0)
    eng.run_until_quiescent(T0, timedelta(minutes=1), max_rounds=max_rounds)
    return eng

def test_html_mode_crawl_matches_synthetic(spark, tmp_path_factory):
    eng_s = _crawl(spark, str(tmp_path_factory.mktemp("synth")), WEB_S)
    eng_h = _crawl(spark, str(tmp_path_factory.mktemp("html")), WEB_H)

    fs = eng_s.frontier.read(spark).select("url", "error", "robotstxt_rejected").collect()
    fh = eng_h.frontier.read(spark).select("url", "error", "robotstxt_rejected").collect()
    # identical URL-seen membership AND per-URL error/robots outcomes
    assert {(r["url"], r["error"], r["robotstxt_rejected"]) for r in fs} == {
        (r["url"], r["error"], r["robotstxt_rejected"]) for r in fh
    }
    assert len(fs) == len(fh)

    # identical link graph INCLUDING ordinals: the html nav self-anchor
    # stores no row and consumes no ordinal (se/page.py:170-179 — link_no
    # is len(links) at append time, so stored rows are contiguous 0..k-1
    # in both engines; round-5 fix renumbers survivors per page)
    ls = {
        (r["src_url"], r["dst_url"], r["link_no"])
        for r in eng_s.links_view().collect()
    }
    lh = {
        (r["src_url"], r["dst_url"], r["link_no"])
        for r in eng_h.links_view().collect()
    }
    assert ls == lh
    assert ls  # non-trivial graph

    # html docs carry the parsed title == the corpus caption; content
    # text leads with the title block
    hdocs = eng_h.documents.read(spark).collect()
    assert hdocs
    for d in hdocs:
        assert d["fmt"] == "html"
        assert d["title"] is not None
        assert d["caption"].startswith(d["title"])
    sdocs = eng_s.documents.read(spark).collect()
    assert {d["url"] for d in hdocs} == {d["url"] for d in sdocs}
    # image-graft docs have no separate title (P7: caption ≡ title)
    assert all(d["title"] is None for d in sdocs)


def test_html_mode_favicon_link_rel_sequence(spark, tmp_path_factory):
    """VERDICT r4 #5: the favicon fetch sequence over an html_mode web
    whose heads declare link-rel icons — data: URIs decode without a
    fetch, declared icon paths fetch url-unique, undeclared pages fall
    back to /favicon.ico, and 404 hosts record missing=True
    (FavIcon.extract, se/models.py:383-440)."""
    from sosse_spark.sources.webgraph import DATA_URI_ICON, host_no

    eng = _crawl(spark, str(tmp_path_factory.mktemp("favhtml")), WEB_H)
    docs = eng.documents.read(spark).collect()
    favs = {r["favicon_url"]: r for r in eng.favicons.read(spark).collect()}

    # doc index from image_id (image_id_for(i) embeds i as the suffix)
    crawled = {int(d["image_id"].split("-")[-1]) for d in docs}
    assert crawled  # non-trivial crawl

    data_uri_docs = [i for i in crawled if i % 7 == 0]
    shortcut_docs = [i for i in crawled if i % 7 == 1]
    sized_docs = [i for i in crawled if i % 7 == 2]
    default_docs = [i for i in crawled if i % 7 > 2]

    if data_uri_docs:
        row = favs[DATA_URI_ICON]
        assert not row["missing"] and row["mimetype"] == "image/png"
        assert row["domain"] is None  # data: URIs have no host
    for i in shortcut_docs:
        h = host_no(i, WEB_H)
        row = favs[f"http://img{h}.example.com/fav/classic.ico"]
        # even hosts serve an icon; odd hosts 404 -> missing
        assert row["missing"] == (h % 2 == 1)
    for i in sized_docs:
        h = host_no(i, WEB_H)
        # sizes=32x32 preferred over the 16x16 declared first
        assert f"http://img{h}.example.com/fav/big.png" in favs
        assert f"http://img{h}.example.com/fav/small.png" not in favs
    for i in default_docs:
        h = host_no(i, WEB_H)
        assert f"http://img{h}.example.com/favicon.ico" in favs

    # url-unique: no favicon URL appears twice in the cache table
    all_rows = eng.favicons.read(spark).groupBy("favicon_url").count().collect()
    assert all(r["count"] == 1 for r in all_rows)
    eng.close()


def test_html_mode_preview_sequence(spark, tmp_path_factory):
    """P9 e2e (DocumentMeta.create_preview → Document.has_thumbnail,
    se/document.py:466-471): over an html_mode web whose heads declare
    og:image / twitter:image arms — data: URIs decode in the parse
    kernel (no fetch), http candidates fetch url-unique into the
    previews cache with decoded dims, a 404 preview leaves
    has_thumbnail False, and pages with no preview metadata get
    none/False."""
    from sosse_spark.sources.corpus import dims_for
    from sosse_spark.sources.webgraph import DATA_URI_PREVIEW, host_no

    # a 36-doc web so a CRAWLABLE 404-preview doc exists: i=30 has
    # i%27==3 (missing arm) and dodges the synthetic error/private/
    # redirect injections (i=3, the other candidate, is error-injected
    # at i%100==3 and never yields a document row)
    web = WebConfig(n_docs=36, n_hosts=3, html_mode=True)
    eng = _crawl(
        spark,
        str(tmp_path_factory.mktemp("prevhtml")),
        web,
        extra_seeds=[url_of(30, web)],
    )
    docs = {int(d["image_id"].split("-")[-1]): d for d in eng.documents.read(spark).collect()}
    assert docs  # non-trivial crawl
    prev_table = eng.previews.read(spark)
    previews = {r["preview_url"]: r for r in prev_table.collect()} if prev_table is not None else {}

    saw_http_ok = saw_http_missing = saw_data = saw_none = False
    for i, d in docs.items():
        if i % 9 == 3 and i % 27 != 3:
            h = host_no(i, web)
            purl = f"http://img{h}.example.com/meta/{i}.png"
            assert d["preview_kind"] == "http" and d["preview_url"] == purl
            assert d["has_thumbnail"] is True
            row = previews[purl]
            assert not row["missing"] and row["mimetype"].startswith("image/")
            assert (row["w"], row["h"]) == dims_for(i)
            saw_http_ok = True
        elif i % 27 == 3:
            assert d["preview_kind"] == "http"
            assert d["has_thumbnail"] is False  # 404 → silent failure arm
            assert previews[d["preview_url"]]["missing"] is True
            saw_http_missing = True
        elif i % 9 == 6:
            assert d["preview_kind"] == "data"
            assert d["preview_url"] == DATA_URI_PREVIEW
            assert d["has_thumbnail"] is True  # decoded in-kernel
            assert DATA_URI_PREVIEW not in previews  # data: never fetched
            saw_data = True
        else:
            assert d["preview_kind"] == "none" and d["preview_url"] is None
            assert d["has_thumbnail"] is False
            saw_none = True
    assert saw_http_ok and saw_http_missing and saw_data and saw_none

    # url-unique: each http preview fetched exactly once across rounds
    counts = prev_table.groupBy("preview_url").count().collect()
    assert all(r["count"] == 1 for r in counts)
    eng.close()
