"""URL kernel parity with the reference golden vectors
(se/test_url.py:29-228 re-expressed as pytest)."""

import pytest

from sosse_spark.functions.urlnorm import (
    absolutize_url,
    has_browsable_scheme,
    lenient_urlparse,
    norm_url_path,
    sanitize_url,
    url_beautify,
    url_remove_fragment,
    url_remove_query_string,
    validate_url,
)

RFC_BASE = "http://a/b/c/d;p?q"

RFC_NORMAL = [
    ("g:h", "g:h"),
    ("http:h", "http://h/"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g/"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
]

RFC_ABNORMAL = [
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g?y/./x", "http://a/b/c/g?y%2F.%2Fx"),
    ("g?y/../x", "http://a/b/c/g?y%2F..%2Fx"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
]


@pytest.mark.parametrize("link,expected", RFC_NORMAL + RFC_ABNORMAL)
def test_rfc3986_resolution(link, expected):
    assert absolutize_url(RFC_BASE, link) == expected


@pytest.mark.parametrize(
    "path,expected",
    [
        ("/b/c", "/b/c"),
        ("/b/c/", "/b/c/"),
        ("/b/c/.", "/b/c/"),
        ("/b/c/./", "/b/c/"),
        ("/b/c/..", "/b/"),
        ("/b/c/../", "/b/"),
        ("/b/c/../g", "/b/g"),
        ("/b/c/../..", "/"),
        ("/b/c/../../", "/"),
        ("/b/c/../../g", "/g"),
    ],
)
def test_norm_url_path(path, expected):
    assert norm_url_path(path) == expected


def test_browsable_scheme():
    for u in ["http://test", "http:/test", "http:test", "https://test", "test", "/test:plop", "127.0.0.1/plop"]:
        assert has_browsable_scheme(u), u
    for u in ["ftp://plop", "mailto:plop", "file:///blah"]:
        assert not has_browsable_scheme(u), u


def test_urlparse_no_scheme():
    for raw in ("://127.0.0.1/", "//127.0.0.1/"):
        p = lenient_urlparse(raw)
        assert (p.scheme, p.netloc, p.path) == ("", "127.0.0.1", "/")


def test_urlparse_no_slash():
    p = lenient_urlparse("mailto:test@exemple.com")
    assert (p.scheme, p.netloc, p.path) == ("mailto", "", "test@exemple.com")
    p = lenient_urlparse("http:netloc")
    assert (p.scheme, p.netloc, p.path) == ("http", "netloc", "/")


def test_urlparse_params():
    p = lenient_urlparse("a;p")
    assert (p.path, p.params) == ("a", "p")
    p = lenient_urlparse(";p")
    assert (p.path, p.params) == ("", "p")


def test_absolutize_basics():
    assert absolutize_url("http://127.0.0.1/", "http://127.0.0.2/") == "http://127.0.0.2/"
    assert absolutize_url("http://127.0.0.1/", "page.html") == "http://127.0.0.1/page.html"
    assert absolutize_url("http://127.0.0.1/dir1/", "/page.html") == "http://127.0.0.1/page.html"
    assert absolutize_url("http://127.0.0.1/dir1/dir2/", "../page.html") == "http://127.0.0.1/dir1/page.html"


def test_absolutize_protocol_relative():
    assert absolutize_url("http://127.0.0.1/", "//127.0.0.2/") == "http://127.0.0.2/"
    assert absolutize_url("https://127.0.0.1/", "//127.0.0.2/") == "https://127.0.0.2/"
    for broken in ("///127.0.0.2/", "////127.0.0.2/"):
        assert absolutize_url("http://127.0.0.1/", broken) == "http://127.0.0.2/"
        assert absolutize_url("https://127.0.0.1/", broken) == "https://127.0.0.2/"


def test_absolutize_rel_query():
    assert absolutize_url("http://127.0.0.1/", "./page.html") == "http://127.0.0.1/page.html"
    assert absolutize_url("https://127.0.0.1/index.html", "./page.html") == "https://127.0.0.1/page.html"
    assert (
        absolutize_url("http://127.0.0.1/index.html?f=1", "./page.html?g=3")
        == "http://127.0.0.1/page.html?g=3"
    )


def test_colon_path():
    assert (
        absolutize_url("https://developer.mozilla.org", "/fr/docs/Web/CSS/::-webkit-search-cancel-button")
        == "https://developer.mozilla.org/fr/docs/Web/CSS/::-webkit-search-cancel-button"
    )


def test_beautify():
    assert url_beautify("http://xn--z7x.com/") == "http://猫.com/"
    assert url_beautify("http://test.com/%E7%8C%AB") == "http://test.com/猫"


def test_sanitize_idna_and_percent():
    assert sanitize_url("http://猫.com/") == "http://xn--z7x.com/"
    # no double-escape of already-encoded sequences
    assert sanitize_url("http://test.com/%E7%8C%AB") == "http://test.com/%E7%8C%AB"
    with pytest.raises(ValueError):
        sanitize_url("noscheme")


def test_strip_helpers():
    assert url_remove_query_string("http://x/p?a=1#f") == "http://x/p"
    assert url_remove_fragment("http://x/p?a=1#f") == "http://x/p?a=1"


def test_validate_url():
    validate_url("http://example.com/ok")
    with pytest.raises(ValueError):
        validate_url("ftp://example.com/")
    with pytest.raises(ValueError):
        validate_url("http://example.com")  # no path


def test_vectorized_udfs(spark):
    """The pandas-UDF wrappers agree with the scalar kernels in a plan."""
    from pyspark.sql import functions as F
    from sosse_spark.functions.urlnorm import absolutize_udf, browsable_udf, canonicalize_udf

    rows = [(RFC_BASE, link, expected) for link, expected in RFC_NORMAL + RFC_ABNORMAL]
    df = spark.createDataFrame(rows, "base string, link string, expected string")
    out = df.withColumn("got", absolutize_udf(F.col("base"), F.col("link"))).collect()
    for r in out:
        assert r["got"] == r["expected"], r["link"]

    df2 = spark.createDataFrame([("http://猫.com/x y",), ("mailto:x",)], "u string")
    got = df2.select(
        canonicalize_udf("u").alias("c"), browsable_udf("u").alias("b")
    ).collect()
    assert got[0]["c"] == "http://xn--z7x.com/x%20y"
    assert got[0]["b"] is True
    assert got[1]["b"] is False
