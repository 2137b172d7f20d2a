"""Q13 REST facade (sosse_spark/api.py) and P15/P16 mime plugins
(operators/plugins.py) — semantics mirrored from se/rest_api.py +
se/search.py:95-229 and se/mime_plugin.py."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sosse_spark.api import RestApi
from sosse_spark.operators.plugins import MimePlugin, apply_mime_plugins


@pytest.fixture()
def api(spark):
    docs = spark.createDataFrame(
        [
            ("http://a/1", "Alpha spark page", "the data about spark here", "text/html", "en", 1),
            ("http://a/2", "Beta", "nothing relevant", "text/plain", "fr", 1),
            ("http://b/3", "Gamma spark", "more spark the data content", "text/html", "en", 2),
            ("http://b/4", "Delta", "spark the data appears", "application/pdf", "en", 1),
        ],
        "url string, title string, content string, mimetype string, lang string, collection_id int",
    )
    links = spark.createDataFrame(
        [
            ("http://a/1", "http://b/3", None, "go to gamma"),
            ("http://b/3", None, "http://ext/x", "external ref"),
        ],
        "src_url string, dst_url string, extern_url string, text string",
    )
    tags = spark.createDataFrame(
        [("t1", "roots", "a"), ("t2", "sub", "a/b")], "tag_id string, name string, path string"
    )
    doc_tags = spark.createDataFrame(
        [("http://a/1", "t2"), ("http://b/4", "t1")], "url string, tag_id string"
    )
    return RestApi(spark, docs, links=links, tags=tags, doc_tags=doc_tags)


def test_search_fts_and_filters(api):
    got = api.search(
        q="spark",
        params=[
            {"ft": "inc", "ff": "mimetype", "fo": "equal", "fv": "text/html"},
            {"ft": "exc", "ff": "url", "fo": "contain", "fv": "b/"},
            {"ft": "inc", "ff": "title", "fo": "contain"},  # incomplete → skipped
        ],
    )
    assert [r.url for r in got.collect()] == ["http://a/1"]


def test_search_no_query_is_empty(api):
    assert api.search(q="", params=[]).count() == 0


def test_search_doc_field_ors_content_title_url(api):
    got = api.search(params=[{"ft": "inc", "ff": "doc", "fo": "contain", "fv": "gamma"}])
    assert sorted(r.url for r in got.collect()) == ["http://b/3"]  # title match
    by_url = api.search(params=[{"ft": "inc", "ff": "doc", "fo": "contain", "fv": "a/2"}])
    assert sorted(r.url for r in by_url.collect()) == ["http://a/2"]  # url match


def test_search_case_flag(api):
    cs = api.search(params=[{"ft": "inc", "ff": "title", "fo": "contain", "fv": "alpha", "fc": "1"}])
    assert cs.count() == 0  # case-sensitive: 'Alpha' != 'alpha'
    ci = api.search(params=[{"ft": "inc", "ff": "title", "fo": "contain", "fv": "alpha"}])
    assert ci.count() == 1


def test_search_linkgraph_filters(api):
    lto = api.search(params=[{"ft": "inc", "ff": "lto_url", "fo": "contain", "fv": "ext/"}])
    assert [r.url for r in lto.collect()] == ["http://b/3"]  # extern_url OR dst url
    lby = api.search(params=[{"ft": "inc", "ff": "lby_txt", "fo": "contain", "fv": "gamma"}])
    assert [r.url for r in lby.collect()] == ["http://b/3"]
    excl = api.search(
        params=[
            {"ft": "inc", "ff": "doc", "fo": "contain", "fv": "spark"},
            {"ft": "exc", "ff": "lto_url", "fo": "contain", "fv": "ext/"},
        ]
    )
    assert "http://b/3" not in {r.url for r in excl.collect()}


def test_search_tag_subtree(api):
    got = api.search(params=[{"ft": "inc", "ff": "tag", "fo": "equal", "fv": "roots"}])
    # tag 'roots' (path a) expands to subtree {a, a/b} → both tagged docs
    assert sorted(r.url for r in got.collect()) == ["http://a/1", "http://b/4"]


def test_search_invalid_field_raises(api):
    with pytest.raises(ValueError, match="FILTER_FIELDS"):
        api.search(params=[{"ft": "inc", "ff": "nope", "fo": "equal", "fv": "x"}])


def test_search_lang_and_pagination(api):
    got = api.search(
        params=[{"ft": "inc", "ff": "doc", "fo": "contain", "fv": "spark"}],
        doc_lang="en",
        order_by=["-url"],
        page=1,
        page_size=2,
    )
    assert [r.url for r in got.collect()] == ["http://b/4", "http://b/3"]


def test_stats_endpoints(api):
    langs = {r.lang: r.doc_count for r in api.lang_stats().collect()}
    assert langs == {"en": 3, "fr": 1}
    mimes = {r.mimetype: r.doc_count for r in api.mime_stats().collect()}
    assert mimes["text/html"] == 2
    rolled = {r.tag_id: r.rolled_count for r in api.tag_stats().collect()}
    assert rolled == {"t1": 2, "t2": 1}
    assert api.document("http://a/2").count() == 1


def test_queue_passes_logical_clock_through(api):
    """POST /api/queue/ delegates to CrawlEngine.seed(urls, t, manual=…)
    — the logical clock rides through so the API stays wall-clock-free."""
    from datetime import datetime

    calls = []

    class StubEngine:
        def seed(self, urls, t, manual=False):
            calls.append((urls, t, manual))

    t0 = datetime(2024, 1, 1)
    api.queue(StubEngine(), ["http://a/new"], t0)
    assert calls == [(["http://a/new"], t0, True)]


def test_atom_feed_escapes_url_for_xml(spark):
    """Q12: URLs with '&' (query strings) and '\"' must be XML-escaped in
    both href attribute and <id> content — else the feed is invalid."""
    from datetime import datetime

    from sosse_spark.operators.search import atom_feed_entries

    docs = spark.createDataFrame(
        [("T & t", 'http://h/p?a=1&b="x"', datetime(2024, 1, 1))],
        "title string, url string, updated timestamp",
    )
    entry = atom_feed_entries(docs).collect()[0]["entry"]
    assert 'href="http://h/p?a=1&amp;b=&quot;x&quot;"' in entry
    assert "<id>http://h/p?a=1&amp;b=&quot;x&quot;</id>" in entry
    assert "<title>T &amp; t</title>" in entry


def test_snippet_escapes_regex_metachars_in_term(spark):
    """Q9: a search term with regex metacharacters highlights literally
    (locate() and the highlight regex must agree)."""
    from sosse_spark.operators.search import snippet_headline

    docs = spark.createDataFrame(
        [(1, "we love c++ here"), (2, "plain c here")], "doc_id long, text string"
    )
    got = {r.doc_id: r.snippet for r in snippet_headline(docs, "c++", window=10).collect()}
    assert list(got) == [1]
    assert "<b>c++</b>" in got[1]


def test_csv_metadata_flatten_and_structured_passthrough(spark):
    """Q11 (se/csv.py:84-103): unstructured metadata flattens to sorted
    'metadata <key>' columns (missing → ''); ANY structured value keeps
    metadata untouched."""
    from datetime import datetime

    from sosse_spark.operators.search import csv_export_flatten

    t = datetime(2024, 1, 1)
    flat_docs = spark.createDataFrame(
        [
            ("u1", t, '{"author": "bob", "pages": 3}'),
            ("u2", t, '{"author": "eve"}'),
            ("u3", t, None),
            ("u4", None, '{"ignored": "row"}'),  # null sort key → excluded
        ],
        "url string, crawl_last timestamp, metadata string",
    )
    out = csv_export_flatten(flat_docs)
    assert out.columns == ["url", "crawl_last", "metadata author", "metadata pages"]
    rows = {r["url"]: (r["metadata author"], r["metadata pages"]) for r in out.collect()}
    assert rows == {"u1": ("bob", "3"), "u2": ("eve", ""), "u3": ("", "")}

    structured = spark.createDataFrame(
        [("u1", t, '{"a": "x"}'), ("u2", t, '{"a": {"nested": 1}}')],
        "url string, crawl_last timestamp, metadata string",
    )
    out2 = csv_export_flatten(structured)
    assert "metadata" in out2.columns  # untouched
    assert out2.count() == 2


# -- P15/P16 plugins ---------------------------------------------------------


def _docs_df(spark):
    return spark.createDataFrame(
        [
            (1, "text/html", "hello", "t"),
            (2, "application/pdf", "pdf body", "t"),
            (3, "text/plain", "plain", "t"),
        ],
        "doc_id long, mimetype string, content string, title string",
    )


def test_plugins_overwrite_matching_rows_only(spark):
    plug = MimePlugin(
        name="upper-html",
        mimetype_re=r"^text/html",
        transform=lambda pdf: pdf.assign(content=pdf["content"].str.upper()),
        writes=("content",),
    )
    got = {r.doc_id: r.content for r in apply_mime_plugins(_docs_df(spark), [plug]).collect()}
    assert got == {1: "HELLO", 2: "pdf body", 3: "plain"}


def test_plugins_apply_in_order(spark):
    p1 = MimePlugin(
        "add-x", r"^text/", lambda pdf: pdf.assign(content=pdf["content"] + "-x"), ("content",)
    )
    p2 = MimePlugin(
        "add-y", r"^text/plain", lambda pdf: pdf.assign(content=pdf["content"] + "-y"), ("content",)
    )
    got = {r.doc_id: r.content for r in apply_mime_plugins(_docs_df(spark), [p1, p2]).collect()}
    assert got[3] == "plain-x-y"  # second plugin sees first's write
    assert got[1] == "hello-x"


def test_plugins_schema_is_preserved_and_writes_validated(spark):
    df = _docs_df(spark)
    plug = MimePlugin("t", ".", lambda pdf: pdf, ("content",))
    assert apply_mime_plugins(df, [plug]).schema == df.schema
    bad = MimePlugin("bad", ".", lambda pdf: pdf, ("nope",))
    with pytest.raises(ValueError, match="unknown columns"):
        apply_mime_plugins(df, [bad])


def test_plugin_rowcount_change_is_an_error(spark):
    plug = MimePlugin("drop", r"^text/", lambda pdf: pdf.iloc[:1], ("content",))
    with pytest.raises(Exception):
        # single partition so one batch holds BOTH text/* rows
        apply_mime_plugins(_docs_df(spark).coalesce(1), [plug]).collect()


# --- search history (se/models.py:443-497 + se/history.py:30-66) ------------


def test_search_history_save_list_delete(spark):
    from datetime import datetime

    from sosse_spark.api import history_delete, history_page, save_history

    t = datetime(2024, 1, 1)
    h = save_history(spark, None, "alice", {"q": "cats"}, [], t)
    assert h.count() == 1

    # fv values join the display query; params sort by key; fc/ft/ff kept
    h = save_history(
        spark, h, "alice",
        {"q": "dogs", "fv1": "big", "ff1": "title", "fo1": "contain", "ft1": "inc",
         "junk": "dropped"},
        [], datetime(2024, 1, 2),
    )
    rows = {r["query"]: r for r in h.collect()}
    assert "dogs (big)" in rows
    assert "junk" not in rows["dogs (big)"]["querystring"]

    # consecutive duplicate (same querystring + tags) is a no-op
    n0 = h.count()
    h = save_history(
        spark, h, "alice",
        {"q": "dogs", "fv1": "big", "ff1": "title", "fo1": "contain", "ft1": "inc"},
        [], datetime(2024, 1, 3),
    )
    assert h.count() == n0

    # empty search is a no-op; query defaults to the fv values when q empty
    assert save_history(spark, h, "alice", {}, [], t).count() == n0
    h = save_history(spark, h, "alice", {"fv1": "solo", "ft1": "inc"}, [], datetime(2024, 1, 4))
    assert h.orderBy(F.col("hist_id").desc()).limit(1).collect()[0]["query"] == "solo"

    # per-user isolation + newest-first pagination
    h = save_history(spark, h, "bob", {"q": "fish"}, [], datetime(2024, 1, 5))
    page = history_page(h, "alice", page=1, page_size=2).collect()
    assert [r["query"] for r in page] == ["solo", "dogs (big)"]
    assert all(r["user"] == "alice" for r in page)

    # delete by id then delete-all — bob's rows untouched
    h2 = history_delete(h, "alice", ids=[page[0]["hist_id"]])
    assert h2.filter("user = 'alice'").count() == h.filter("user = 'alice'").count() - 1
    h3 = history_delete(h2, "alice")
    assert h3.filter("user = 'alice'").count() == 0
    assert h3.filter("user = 'bob'").count() == 1


def test_excluded_urls_parse_and_opensearch():
    from sosse_spark.api import opensearch_descriptor, parse_excluded_urls

    assert parse_excluded_urls(" http://a/ \n\nhttp://b/x\n") == ["http://a/", "http://b/x"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_excluded_urls("\n  \n")
    xml = opensearch_descriptor("http://search.example.com/")
    assert 'template="http://search.example.com/?q={searchTerms}"' in xml
    assert xml.startswith('<?xml version="1.0"')


# --- policy export/import (se/crawl_policy_backup.py:35-231) -------------


def test_policy_export_import_roundtrip():
    from sosse_spark.operators.admission import (
        CollectionPolicy,
        policy_export,
        policy_import,
    )

    p1 = CollectionPolicy(
        collection_id=7,
        unlimited_regex=r"^http://a/",
        limited_regex=r"^http://b/",
        excluded_regex=r"\.pdf$",
        recursion_depth=3,
        keep_params=False,
        hash_no_numbers=True,
        recrawl_freq="constant",
        recrawl_dt_min=60,
        recrawl_dt_max=600,
        recrawl_condition="always",
        queue_to_collections=(2, 3),
        webhooks=("discovery", "change"),
        auth_login_url_re=r"/login",
        auth_fields=(("user", "u"), ("password", "p")),
    )
    p2 = CollectionPolicy(collection_id=8)
    text = policy_export([p1, p2])
    restored = policy_import(text)
    assert restored == [p1, p2]
    # unknown fields fail loudly (config from a newer engine)
    with pytest.raises(ValueError, match="bogus"):
        policy_import(text.replace('"collection_id"', '"bogus"'))
    with pytest.raises(ValueError, match="version"):
        policy_import('{"version": 99, "collections": []}')


def test_policy_import_drives_identical_crawl(spark, tmp_path_factory):
    """Export → fresh engine → import → identical admission/recrawl
    behavior on the same seeds (the migration round-trip the reference's
    CrawlPolicyBackup exists for)."""
    from datetime import datetime, timedelta

    from sosse_spark.operators.admission import (
        CollectionPolicy,
        policy_export,
        policy_import,
    )
    from sosse_spark.sources.webgraph import WebConfig, url_of
    from sosse_spark.streaming.crawl_loop import CrawlEngine

    t0 = datetime(2024, 1, 1)
    web = WebConfig(n_docs=24, n_hosts=3)
    pol = CollectionPolicy(
        collection_id=1,
        unlimited_regex=r"^http://img[01]\.example\.com/",
        limited_regex=r"^http://img[0-9]+\.example\.com/",
        recursion_depth=1,
        keep_params=False,
        recrawl_freq="adaptive",
        recrawl_dt_min=1800,
        recrawl_dt_max=7200,
    )
    (pol2,) = policy_import(policy_export([pol]))
    seeds = [url_of(2, web), url_of(15, web)]

    outs = []
    for p in (pol, pol2):
        root = str(tmp_path_factory.mktemp("polmig"))
        eng = CrawlEngine(spark, root, web, p, n_buckets=4, batch_size=16, per_host_budget=8)
        eng.seed(seeds, t0)
        eng.run_until_quiescent(t0, timedelta(minutes=1), max_rounds=5)
        fr = eng.frontier.read(spark).select(
            "url", "crawl_recurse", "crawl_dt", "error"
        ).collect()
        outs.append({(r["url"], r["crawl_recurse"], r["crawl_dt"], r["error"]) for r in fr})
    assert outs[0] == outs[1] and outs[0]


# --- hdd_stats / online_status / search redirect --------------------------


def test_hdd_stats_shape(tmp_path):
    import os

    from sosse_spark.api import hdd_stats

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "documents"))
    os.makedirs(os.path.join(root, "frontier"))
    with open(os.path.join(root, "documents", "x.parquet"), "wb") as f:
        f.write(b"p" * 1000)
    with open(os.path.join(root, "frontier", "y.parquet"), "wb") as f:
        f.write(b"q" * 500)
    got = hdd_stats(root)
    assert got["html"] == 1000  # payload table ≙ HTML-dump dir
    assert got["db"] == 500
    assert got["screenshots"] == 0
    assert got["free"] > 0 and got["other"] >= 0
    assert got["tables"] == {"documents": 1000, "frontier": 500}


def test_hdd_stats_shrinks_after_vacuum(spark, tmp_path_factory):
    """hdd_stats reconciles with the on-disk tree and shrinks when
    vacuum drops superseded snapshots (se/rest_api.py:75-101 +
    the engine's disk GC)."""
    from datetime import datetime, timedelta

    from sosse_spark.api import hdd_stats
    from sosse_spark.operators.admission import CollectionPolicy
    from sosse_spark.sources.webgraph import WebConfig, url_of
    from sosse_spark.streaming.crawl_loop import CrawlEngine

    t0 = datetime(2024, 1, 1)
    web = WebConfig(n_docs=20, n_hosts=3)
    pol = CollectionPolicy(
        collection_id=1,
        unlimited_regex=r"^http://img[0-9]+\.example\.com/",
        recursion_depth=2,
        keep_params=False,
        recrawl_freq="adaptive",
    )
    root = str(tmp_path_factory.mktemp("hdd"))
    eng = CrawlEngine(spark, root, web, pol, n_buckets=4, batch_size=16, per_host_budget=8)
    eng.seed([url_of(2, web), url_of(11, web)], t0)
    eng.run_round(t0)
    eng.run_round(t0 + timedelta(minutes=1))
    before = hdd_stats(root)
    assert before["db"] > 0 and before["tables"].get("frontier", 0) > 0
    eng.vacuum()
    after = hdd_stats(root)
    assert after["db"] + after["html"] < before["db"] + before["html"]
    # totals reconcile with a direct walk
    import os

    du = 0
    for dirpath, _d, files in os.walk(root):
        for fn in files:
            du += os.path.getsize(os.path.join(dirpath, fn))
    assert after["db"] + after["html"] == sum(after["tables"].values()) == du


def test_online_status_modes_and_cache():
    from sosse_spark.api import OnlineStatus, search_redirect_context

    calls = []

    def probe_ok():
        calls.append(1)

    s = OnlineStatus(check_cache=2, probe=probe_ok)
    # forced verdicts never probe (se/online.py:33-39)
    assert s.status("o") == "online" and s.status("l") == "offline" and not calls
    assert s.status() == "online" and len(calls) == 1
    # cached for check_cache requests, then re-probed
    assert s.status() == "online" and s.status() == "online" and len(calls) == 1
    assert s.status() == "online" and len(calls) == 2

    def probe_bad():
        calls.append(1)
        raise ConnectionError("no net")

    b = OnlineStatus(check_cache=None, probe=probe_bad)
    n0 = len(calls)
    assert b.status() == "offline" and len(calls) == n0 + 1
    # cache-forever arm (SOSSE_ONLINE_CHECK_CACHE=None, se/online.py:42-43)
    assert b.status() == "offline" and len(calls) == n0 + 1
    assert b.check() == {"status": ConnectionError.__doc__, "success": False}
    assert OnlineStatus(enabled=False).status() == ""
    # search redirect context (se/search_redirect.py:25-33)
    assert search_redirect_context("http://me.local/", "a b&c") == {
        "url": "http://me.local/",
        "q": "a+b%26c",
    }


def test_archive_latest_picks_newest_round(spark):
    from sosse_spark.api import archive_latest

    docs = spark.createDataFrame(
        [
            ("http://h/a/page.html", "png", b"old", "c1", 1),
            ("http://h/a/page.html", "html", b"new", "c2", 2),
            ("http://h/other", "png", b"x", "c3", 2),
        ],
        "url string, fmt string, bytes binary, caption string, round_no int",
    )
    got = archive_latest(docs, "http://h/a/page.html").collect()
    assert len(got) == 1
    r = got[0]
    assert bytes(r["bytes"]) == b"new" and r["round_no"] == 2
    # DownloadView filename rule: URL tail, query-decoded, extension
    # swapped for the payload's format (se/download.py:41-47)
    assert r["filename"] == "page.html"
    assert r["filesize"] == 3
    assert archive_latest(docs, "http://h/missing").count() == 0


# ---------------------------------------------------------------------------
# /api/webhook router parity (WebhookViewSet, se/rest_api.py:470-537)


def test_webhook_list_serializes_configs_name_ordered():
    from sosse_spark.api import webhook_list
    from sosse_spark.operators.webhooks import WebhookConfig

    cfgs = (
        WebhookConfig(name="zeta", url="http://h/z"),
        WebhookConfig(name="alpha", url="http://h/a", retries=2),
    )
    out = webhook_list(cfgs)
    assert [c["name"] for c in out] == ["alpha", "zeta"]
    assert out[0]["retries"] == 2 and out[0]["url"] == "http://h/a"
    # full-field serialization (fields="__all__")
    assert {"name", "url", "method", "body_template", "trigger_condition"} <= set(out[0])


def test_webhook_test_trigger_arms():
    """test_trigger sends the candidate config against example_doc and
    returns the raw outcome; an invalid body template is the 400 arm
    (se/rest_api.py:487-505)."""
    import json

    from sosse_spark.api import example_doc, webhook_test_trigger
    from sosse_spark.operators.webhooks import WebhookConfig

    seen = {}

    def tp(method, url, headers, body, timeout):
        seen.update(method=method, url=url, body=json.loads(body), auth=headers.get("Authorization"))
        return 200, "OK", "fine"

    cfg = WebhookConfig(
        name="w", url="http://h/x", body_template='{"u": "${url}", "t": "${title}"}',
        username="u", password="p",
    )
    res = webhook_test_trigger(cfg, transport=tp)
    assert res == {"status_code": 200, "status_string": "OK", "response": "fine", "error": None}
    assert seen["body"] == {"u": example_doc()["url"], "t": "Example Title"}
    assert seen["auth"].startswith("Basic ")

    # invalid template JSON -> config-error arm, no send happens
    bad = WebhookConfig(name="w", url="http://h/x", body_template="{not json")
    res = webhook_test_trigger(bad, transport=tp)
    assert set(res) == {"error"} and res["error"]

    # transport failure -> exception arm (reference 4-key shape)
    def down(method, url, headers, body, timeout):
        raise ConnectionError("refused")

    res = webhook_test_trigger(cfg, transport=down)
    assert res["status_code"] is None and "refused" in res["error"]


def test_webhook_status_line():
    from sosse_spark.api import webhook_status_line

    ok, line = webhook_status_line(
        {"status_code": 200, "status_string": "OK", "response": "body", "error": None}
    )
    assert ok and line == "200 OK\nbody"
    ok, line = webhook_status_line(
        {"status_code": 500, "status_string": "ISE", "response": "boom", "error": None}
    )
    assert not ok and line == "500 ISE\nboom"
    ok, line = webhook_status_line(
        {"status_code": None, "status_string": None, "response": None, "error": "timeout"}
    )
    assert not ok and line == "Error\ntimeout"


# --- /download/ context (se/download.py:29-55) -----------------------------


def test_download_context_filename_munging():
    from sosse_spark.api import download_context

    # last path segment, unquoted, extension swapped for the asset's
    ctx = download_context(
        "http://x/docs/Annual%20Report.html/", "5f/2a9c.pdf", 2048, "application/pdf"
    )
    assert ctx["filename"] == "Annual Report.pdf"
    assert ctx["filesize"] == 2048
    assert ctx["mimebase"] == "application"
    # a segment with no extension keeps its whole name
    ctx2 = download_context("http://x/raw/datafile", "ab/cd.bin", 1, "application/octet-stream")
    assert ctx2["filename"] == "datafile.bin"


def test_mimetype_icon_first_match_order():
    from sosse_spark.api import mimetype_icon

    # specific rows beat family globs (table-order scan, se/utils.py:214)
    assert mimetype_icon("text/html") != mimetype_icon("text/plain")
    assert mimetype_icon("image/webp") == mimetype_icon("image/png")
    # unknown mimetypes and None take the generic glyph
    assert mimetype_icon("application/x-unknown") == mimetype_icon(None)
