"""Real-HTML DOM-walk goldens — mirrors the reference parse semantics
(se/page.py:103-233) including its own test vectors:
test_008_base_header (se/test_crawl.py:338-362) and
test_150_link_nested_text (se/test_crawl.py:593-624)."""

from pyspark.sql import functions as F

from sosse_spark.operators.htmlparse import (
    parse_html,
    parse_html_batch,
    sniff_is_html,
)


def test_nested_anchor_text_golden():
    # se/test_crawl.py:593-624: content "Root Nested", link text
    # "Nested", pos 5, ordinal 0
    p = parse_html("http://127.0.0.1/", b'Root <a href="/page1/"><span>Nested</span></a>')
    assert p["text"] == "Root Nested"
    (l,) = p["links"]
    assert l["text"] == "Nested"
    assert l["pos"] == 5
    assert l["a_no"] == 0
    assert l["abs_url"] == "http://127.0.0.1/page1/"
    assert l["in_nav"] is False


def test_base_href_golden():
    # se/test_crawl.py:338-362: <base href="/base/"> re-bases link
    # resolution (se/page.py:88-95)
    p = parse_html(
        "http://127.0.0.1/",
        b"""
        <html>
            <head><base href="/base/" /></head>
            <body>
                <a href="test">base test</a>
            </body>
        </html>
        """,
    )
    assert p["text"] == "base test"
    assert p["base_url"] == "http://127.0.0.1/base/"
    assert p["links"][0]["abs_url"] == "http://127.0.0.1/base/test"


def test_block_elements_emit_newlines_and_skips():
    # block-elem newline algebra (se/page.py:216-221) + title/script/
    # style/template/comment skips (se/page.py:68-70,138-143)
    p = parse_html(
        "http://h/",
        """<html><head><title>T1</title><style>b{}</style></head><body>
        <div>one</div><p>two <b>bold</b></p><script>var x=1;</script>
        <template><div>nope</div></template><!-- comment -->tail</body></html>""",
    )
    assert p["title"] == "T1"
    assert p["text"] == "one\ntwo bold\ntail"


def test_nav_suppresses_text_keeps_links():
    # se/page.py:144-145 + Link.in_nav: nav/header/footer text is
    # suppressed, links survive flagged in_nav
    p = parse_html(
        "http://h/",
        '<body><nav>Menu <a href="/x">X</a></nav>Body <a href="/y">Y</a></body>',
    )
    assert p["text"] == "Body Y"
    assert [(l["abs_url"], l["in_nav"]) for l in p["links"]] == [
        ("http://h/x", True),
        ("http://h/y", False),
    ]
    # remove_nav=False (Collection.REMOVE_NAV_NO) keeps nav text
    p2 = parse_html(
        "http://h/",
        '<body><nav>Menu <a href="/x">X</a></nav>Body</body>',
        remove_nav=False,
    )
    assert p2["text"] == "Menu X Body"


def test_header_footer_also_suppressed():
    p = parse_html(
        "http://h/",
        "<body><header>Top</header><div>mid</div><footer>Bottom</footer></body>",
    )
    assert p["text"] == "mid\n"


def test_non_browsable_hrefs_dropped_unless_extern():
    # se/page.py:183-198: mailto/js links only materialize under
    # store_extern_links
    html = '<a href="mailto:a@b">mail</a> <a href="/ok">ok</a>'
    p = parse_html("http://h/", html)
    assert [l["abs_url"] for l in p["links"]] == ["http://h/ok"]
    p = parse_html("http://h/", html, store_extern_links=True)
    assert [(l["abs_url"], l["browsable"]) for l in p["links"]] == [
        ("mailto:a@b", False),
        ("http://h/ok", True),
    ]
    # candidate ordinals are document-order positions among EMITTED links
    assert [l["a_no"] for l in p["links"]] == [0, 1]


def test_anchor_pos_counts_preceding_space():
    # the separating space lands BEFORE pos is captured
    # (se/page.py:150-153 then :172-177)
    p = parse_html("http://h/", 'ab <a href="/x">cd</a>')
    assert p["text"] == "ab cd"
    assert p["links"][0]["pos"] == 3


def test_li_autoclose_matches_html5lib():
    p = parse_html("http://h/", "<ul><li>a<li>b</ul>")
    assert p["text"] == "a\nb\n"


def test_sniff_is_html():
    # se/page.py:49-55 prefix check
    assert sniff_is_html(b"  <!DOCTYPE HTML><html>")
    assert sniff_is_html(b"<html lang='en'>")
    assert not sniff_is_html(b"\x89PNG\r\n")
    assert not sniff_is_html(b"just text")


def test_empty_and_malformed_html():
    assert parse_html("http://h/", b"")["text"] == ""
    p = parse_html("http://h/", "<div><a href='/x'>unclosed")
    assert p["links"][0]["abs_url"] == "http://h/x"
    # the implicitly-closed <div> still fires its block newline
    assert p["text"] == "unclosed\n"


def test_parse_html_batch_spark(spark):
    pages = spark.createDataFrame(
        [
            ("http://127.0.0.1/", b'Root <a href="/page1/"><span>Nested</span></a>'),
            (
                "http://h/",
                b'<html><head><title>T</title><base href="/b/"></head>'
                b'<body><nav><a href="n">N</a></nav><p>para <a href="x">X</a></p></body></html>',
            ),
        ],
        "url string, content binary",
    )
    got = {r["url"]: r for r in parse_html_batch(pages).collect()}
    r1 = got["http://127.0.0.1/"]
    assert r1["text"] == "Root Nested"
    assert r1["links"][0]["abs_url"] == "http://127.0.0.1/page1/"
    r2 = got["http://h/"]
    assert r2["title"] == "T"
    assert r2["base_url"] == "http://h/b/"
    assert r2["text"] == "para X\n"
    assert [(l["abs_url"], l["in_nav"]) for l in r2["links"]] == [
        ("http://h/b/n", True),
        ("http://h/b/x", False),
    ]
    # the stage is one Arrow boundary over a narrow projection — no
    # shuffle in the plan
    plan = parse_html_batch(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dropped_candidates_consume_no_ordinal():
    # the reference numbers only materialized links (se/page.py:173):
    # with store_extern_links off, a dropped mailto must not leave an
    # a_no gap
    html = '<a href="mailto:a@b">m</a> <a href="/ok">ok</a> <a href="/two">t</a>'
    p = parse_html("http://h/", html)
    assert [(l["a_no"], l["abs_url"]) for l in p["links"]] == [
        (0, "http://h/ok"),
        (1, "http://h/two"),
    ]


def test_favicon_selection_precedence():
    """FavIcon._get_url (se/models.py:424-440): shortcut-icon beats
    icon; among several, sizes=32x32 then 16x16 then first; no
    declaration -> /favicon.ico default; data: URIs pass through."""
    from sosse_spark.operators.htmlparse import parse_html

    u = "http://h.example.com/a/page.html"

    # no declaration -> default, absolutized against the DOC url
    out = parse_html(u, "<html><head></head><body>x</body></html>")
    assert out["favicon"] == "http://h.example.com/favicon.ico"

    # rel="shortcut icon" wins over plain icon regardless of order
    html = (
        '<html><head><link rel="icon" href="/plain.png">'
        '<link rel="shortcut icon" href="/shortcut.ico"></head><body>x</body></html>'
    )
    assert parse_html(u, html)["favicon"] == "http://h.example.com/shortcut.ico"

    # several plain icons: sizes=32x32 preferred, then 16x16
    html = (
        '<html><head><link rel="icon" sizes="16x16" href="/s16.png">'
        '<link rel="icon" sizes="32x32" href="/s32.png"></head><body>x</body></html>'
    )
    assert parse_html(u, html)["favicon"] == "http://h.example.com/s32.png"
    html = (
        '<html><head><link rel="icon" sizes="16x16" href="/s16.png">'
        '<link rel="icon" sizes="64x64" href="/s64.png"></head><body>x</body></html>'
    )
    assert parse_html(u, html)["favicon"] == "http://h.example.com/s16.png"

    # several with no preferred size: the first
    html = (
        '<html><head><link rel="icon" href="/first.png">'
        '<link rel="icon" href="/second.png"></head><body>x</body></html>'
    )
    assert parse_html(u, html)["favicon"] == "http://h.example.com/first.png"

    # apple-touch-icon is still rel~icon (the reference's loose
    # re.compile("icon") matches it)
    html = '<html><head><link rel="apple-touch-icon" href="/apple.png"></head><body>x</body></html>'
    assert parse_html(u, html)["favicon"] == "http://h.example.com/apple.png"

    # relative href resolves against the DOC url (not <base href> —
    # FavIcon.extract passes doc.url, se/models.py:389)
    html = (
        '<html><head><base href="http://other.example.com/b/">'
        '<link rel="icon" href="rel.png"></head><body>x</body></html>'
    )
    assert parse_html(u, html)["favicon"] == "http://h.example.com/a/rel.png"

    # query string + fragment stripped (se/models.py:390-391)
    html = '<html><head><link rel="icon" href="/i.png?v=3#f"></head><body>x</body></html>'
    assert parse_html(u, html)["favicon"] == "http://h.example.com/i.png"

    # data: URI passes through untouched
    from sosse_spark.sources.webgraph import DATA_URI_ICON

    html = f'<html><head><link rel="icon" href="{DATA_URI_ICON}"></head><body>x</body></html>'
    assert parse_html(u, html)["favicon"] == DATA_URI_ICON


def test_fetch_favicons_for_urls_arms(spark):
    """fetch_favicons_for_urls: data:-URI decode (declared mimetype,
    missing=False), bad-encoding data URI (missing=True), fetched icon
    with magic image/* gate, 404 host (missing=True)."""
    from sosse_spark.operators.fetch import fetch_favicons_for_urls
    from sosse_spark.sources.webgraph import DATA_URI_ICON, WebConfig

    cfg = WebConfig(n_docs=8, n_hosts=4, html_mode=True)
    urls = spark.createDataFrame(
        [
            (DATA_URI_ICON,),
            ("data:image/png;hex,deadbeef",),  # non-base64 encoding
            ("data:image/png;base64,%%%not-base64%%%",),  # decode error
            ("http://img0.example.com/favicon.ico",),  # host 0: has icon
            ("http://img1.example.com/fav/classic.ico",),  # host 1: 404
        ],
        "favicon_url string",
    )
    rows = {r["favicon_url"]: r for r in fetch_favicons_for_urls(urls, cfg).collect()}
    ok = rows[DATA_URI_ICON]
    assert not ok["missing"] and ok["mimetype"] == "image/png" and ok["content_len"] == 70
    assert rows["data:image/png;hex,deadbeef"]["missing"]
    assert rows["data:image/png;base64,%%%not-base64%%%"]["missing"]
    f0 = rows["http://img0.example.com/favicon.ico"]
    assert not f0["missing"] and f0["mimetype"] == "image/png" and f0["domain"] == "img0.example.com"
    assert rows["http://img1.example.com/fav/classic.ico"]["missing"]
