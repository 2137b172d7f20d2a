"""P11 CSS half: url() scanner parity goldens (se/html_snapshot.py:40-87),
snapshot rewrite (handle_css, :92-117), and the stored-sheet asset
listing (css_extract_assets, :120-127) — plus the composition with the
asset router (operators/snapshot.py)."""

import pyspark.sql.functions as F
import pytest

from sosse_spark.operators.csssnap import (
    css_asset_urls,
    css_extract_assets,
    css_rewrite,
    css_segments,
    extract_css_url,
)

# ------------------------------------------------------------------ scanner


def segs(css):
    """Non-empty (is_url, segment) pairs — empty literals are dropped by
    the kernel too (declared delta; reassembly-neutral)."""
    return [(u, s) for u, s in extract_css_url(css) if s]


def test_scanner_unquoted():
    assert segs("body { background: url(https://a.com/x.png); }") == [
        (False, "body { background: "),
        (True, "https://a.com/x.png"),
        (False, "; }"),
    ]


def test_scanner_quoted_and_spaced():
    # double quotes with padding spaces inside the parens
    assert segs('a url( "/assets/s.css" ) b') == [
        (False, "a "),
        (True, "/assets/s.css"),
        (False, " b"),
    ]
    # single quotes, no spaces
    assert segs("url('q.png')x") == [(True, "q.png"), (False, "x")]
    # unquoted with spaces: leading spaces are skipped but TRAILING
    # spaces are collected into the target (reference behavior — the
    # unquoted loop reads to the closing paren)
    assert segs("url(  spaced.png  ) end") == [
        (True, "spaced.png  "),
        (False, " end"),
    ]


def test_scanner_escaped_quote():
    # backslash escape consumes the next char into the url
    assert segs('pre url("a\\"b.png") post') == [
        (False, "pre "),
        (True, 'a"b.png'),
        (False, " post"),
    ]


def test_scanner_non_browsable_spans_stay_literal():
    # fragment, data: and javascript: targets keep the ORIGINAL span
    assert segs("x url(#frag) y") == [
        (False, "x "),
        (False, "url(#frag)"),
        (False, " y"),
    ]
    assert segs("url(data:image/png;base64,AA==) t") == [
        (False, "url(data:image/png;base64,AA==)"),
        (False, " t"),
    ]


def test_scanner_empty_target_folds_into_next_literal():
    # url() collects no target -> the span is swallowed by the next
    # literal segment (reference behavior: prev is not advanced)
    assert segs("a url() b url(y.png) c") == [
        (False, "a "),
        (False, "url() b "),
        (True, "y.png"),
        (False, " c"),
    ]


def test_scanner_truncated_input_is_literal_not_crash():
    # declared delta: the reference IndexErrors on truncated spans; we
    # bounds-check.  An empty truncated span stays literal; a collected
    # target still classifies normally even without its closing paren.
    assert segs("tail url(") == [(False, "tail "), (False, "url(")]
    assert segs("x url(abc") == [(False, "x "), (True, "abc")]


# ------------------------------------------------------------- spark stages


@pytest.fixture(scope="module")
def sheets(spark):
    rows = [
        (
            "http://s.com/dir/page.html",
            "http://s.com/dir/page.html",
            ".a { background: url(https://cdn.com/i.png); } "
            '.b { src: url( "/assets/s.css" ); } '
            ".c { mask: url(#sec); } "
            ".d { cursor: url('img/c.cur'); }",
        ),
        ("http://s.com/empty.html", "http://s.com/empty.html", "no urls here"),
    ]
    return spark.createDataFrame(rows, "url string, base_url string, css string")


def test_css_asset_urls(spark, sheets):
    out = css_asset_urls(css_segments(sheets)).orderBy("url", "asset_no").collect()
    assert [(r.asset_no, r.asset_url, r.force_css) for r in out] == [
        (1, "https://cdn.com/i.png", False),
        (2, "http://s.com/assets/s.css", True),  # root-relative + force_css
        (3, "http://s.com/dir/img/c.cur", False),  # dirname-relative
    ]


def test_css_rewrite_identity_refs(spark, sheets):
    out = {r.url: r.css_out for r in css_rewrite(css_segments(sheets)).collect()}
    assert out["http://s.com/dir/page.html"] == (
        '.a { background: url("https://cdn.com/i.png"); } '
        '.b { src: url("http://s.com/assets/s.css"); } '
        ".c { mask: url(#sec); } "
        '.d { cursor: url("http://s.com/dir/img/c.cur"); }'
    )
    assert out["http://s.com/empty.html"] == "no urls here"


def test_css_rewrite_with_routed_refs(spark, sheets):
    # compose with the P11 router: refs come from route_assets' ref col
    refs = spark.createDataFrame(
        [
            ("https://cdn.com/i.png", "/snap/aa.png"),
            ("http://s.com/assets/s.css", "/snap/bb.css"),
        ],
        "asset_url string, ref string",
    )
    out = {r.url: r.css_out for r in css_rewrite(css_segments(sheets), refs).collect()}
    assert 'url("/snap/aa.png")' in out["http://s.com/dir/page.html"]
    assert 'url("/snap/bb.css")' in out["http://s.com/dir/page.html"]
    # unrouted asset falls back to its absolutized url (download_asset
    # identity arm)
    assert 'url("http://s.com/dir/img/c.cur")' in out["http://s.com/dir/page.html"]


def test_css_extract_assets_lists_snapshot_refs(spark):
    stored = spark.createDataFrame(
        [
            (
                "s1",
                "s1",
                'a url("/snap/aa.png") b url("/snap/bb.css") '
                'c url("http://ext.com/x.png") d url("/snap/aa.png")',
            )
        ],
        "url string, base_url string, css string",
    )
    out = css_extract_assets(css_segments(stored), "/snap/").orderBy("asset_filename")
    assert [r.asset_filename for r in out.collect()] == ["aa.png", "bb.css"]
