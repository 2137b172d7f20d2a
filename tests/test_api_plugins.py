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
