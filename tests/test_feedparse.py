"""Feed ingest parse (P4 second half): RSS/Atom entries -> structured
rows and the reference-template HTML page (se/document.py:327-345 +
se/templates/se/feed.html shape), which must flow through the standard
DOM walk like any html_mode page."""

import pytest

from sosse_spark.operators.feedparse import feed_html, parse_feed

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Example Feed</title>
  <link>http://ex.com/</link>
  <description>News</description>
  <item><title>First</title><link>http://ex.com/1</link>
        <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
  <item><title>Second</title><link>http://ex.com/2</link></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Feed</title>
  <subtitle>Sub</subtitle>
  <link rel="self" href="http://ex.com/self.xml"/>
  <link rel="alternate" href="http://ex.com/"/>
  <entry><title>E1</title><link href="http://ex.com/e1"/>
         <updated>2024-01-01T00:00:00Z</updated></entry>
</feed>"""


def test_parse_rss_and_atom_entries():
    r = parse_feed(RSS)
    assert r["kind"] == "rss" and r["title"] == "Example Feed"
    assert r["link"] == "http://ex.com/" and r["description"] == "News"
    assert [e["link"] for e in r["entries"]] == ["http://ex.com/1", "http://ex.com/2"]
    assert r["entries"][0]["updated"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    assert r["entries"][1]["updated"] is None

    a = parse_feed(ATOM)
    assert a["kind"] == "atom" and a["title"] == "Atom Feed"
    assert a["link"] == "http://ex.com/"  # rel=alternate wins over rel=self
    assert a["description"] == "Sub"
    assert [e["link"] for e in a["entries"]] == ["http://ex.com/e1"]


RDF = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns="http://purl.org/rss/1.0/"
         xmlns:dc="http://purl.org/dc/elements/1.1/">
  <channel rdf:about="http://ex.com/">
    <title>RDF Feed</title>
    <link>http://ex.com/</link>
    <description>Old school</description>
    <items><rdf:Seq><rdf:li rdf:resource="http://ex.com/a"/></rdf:Seq></items>
  </channel>
  <item rdf:about="http://ex.com/a">
    <title>A</title><link>http://ex.com/a</link>
    <dc:date>2024-02-02T00:00:00Z</dc:date>
  </item>
  <item rdf:about="http://ex.com/b">
    <title>B</title><link>http://ex.com/b</link>
  </item>
</rdf:RDF>"""


def test_parse_rss10_rdf_entries():
    # RSS 1.0: channel metadata + root-level item siblings + dc:date
    # (feedparser's RDF normalization; the rdf:Seq only orders refs).
    r = parse_feed(RDF)
    assert r["kind"] == "rss10"
    assert r["title"] == "RDF Feed"
    assert r["link"] == "http://ex.com/"
    assert r["description"] == "Old school"
    assert [e["link"] for e in r["entries"]] == ["http://ex.com/a", "http://ex.com/b"]
    assert r["entries"][0]["updated"] == "2024-02-02T00:00:00Z"
    assert r["entries"][1]["updated"] is None
    # renders through the same feed.html template shape
    page = feed_html(r)
    assert '<a href="http://ex.com/a">A</a>' in page
    assert "<title>RDF Feed</title>" in page


def test_rdf_without_items_rejected():
    empty = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns="http://purl.org/rss/1.0/">
      <channel><title>t</title></channel></rdf:RDF>"""
    assert parse_feed(empty) is None


def test_non_feeds_and_empty_feeds_rejected():
    assert parse_feed("<html><body>hi</body></html>") is None
    assert parse_feed("not xml at all") is None
    # a feed with zero entries is NOT treated as a feed (the reference's
    # early return, se/document.py:328-330)
    assert parse_feed("<rss><channel><title>t</title></channel></rss>") is None
    assert parse_feed(b"<feed xmlns='http://www.w3.org/2005/Atom'><title>t</title></feed>") is None


def test_feed_html_through_standard_dom_walk():
    """The rendered page must behave like the reference's feed.html:
    page title = feed title; link 0 = feed link; entry links follow in
    document order with entry titles as anchor text."""
    from sosse_spark.operators.htmlparse import parse_html

    page = feed_html(parse_feed(RSS))
    parsed = parse_html("http://ex.com/feed.xml", page)
    assert parsed["title"] == "Example Feed"
    hrefs = [l["abs_url"] for l in parsed["links"]]
    assert hrefs == ["http://ex.com/", "http://ex.com/1", "http://ex.com/2"]
    texts = [l["text"] for l in parsed["links"]]
    assert texts == ["Example Feed", "First", "Second"]
    assert "News" in parsed["text"]


def test_feed_html_escapes_markup():
    evil = RSS.replace("First", "a &lt;b&gt; &amp;c")
    page = feed_html(parse_feed(evil))
    assert "<b>" not in page  # re-escaped, not injected
    from sosse_spark.operators.htmlparse import parse_html

    parsed = parse_html("http://ex.com/feed.xml", page)
    assert parsed["links"][1]["text"] == "a <b> &c"


def test_feed_entries_batch_rows(spark):
    from sosse_spark.operators.feedparse import feed_entries_batch

    df = spark.createDataFrame(
        [("u1", RSS), ("u2", ATOM), ("u3", "<html></html>")],
        "url string, content string",
    )
    rows = sorted(
        feed_entries_batch(df).collect(), key=lambda r: (r["url"], r["entry_no"])
    )
    assert [(r["url"], r["entry_no"], r["entry_url"]) for r in rows] == [
        ("u1", 0, "http://ex.com/1"),
        ("u1", 1, "http://ex.com/2"),
        ("u2", 0, "http://ex.com/e1"),
    ]
    assert rows[0]["feed_kind"] == "rss" and rows[2]["feed_kind"] == "atom"
