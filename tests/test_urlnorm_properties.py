"""Property-based tests for the URL kernel (hypothesis).

The canonical URL IS the URL-seen identity (SURVEY §2.1 F2): if
canonicalization is not idempotent, a URL re-extracted from a crawled
page re-enters the frontier under a second identity and the URL-seen
invariant silently breaks.  These properties fuzz far beyond the golden
vectors ported from se/test_url.py.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from sosse_spark.functions.urlnorm import (
    absolutize_url,
    norm_url_path,
    sanitize_url,
    validate_url,
)

# URL-ish building blocks: hosts, paths with dot-segments, queries with
# characters that exercise the percent-encoding normalizer
_host = st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_pathseg = st.from_regex(r"[A-Za-z0-9._~ %/\-]{0,12}", fullmatch=True)
_query = st.from_regex(r"[A-Za-z0-9=&+ %]{0,16}", fullmatch=True)


@st.composite
def urls(draw):
    host = draw(_host)
    path = draw(_pathseg)
    q = draw(_query)
    dots = draw(st.sampled_from(["", "./", "../", "a/../", "b/./"]))
    u = f"http://{host}/{dots}{path}"
    if q:
        u += f"?{q}"
    return u


@given(urls())
@settings(max_examples=300, deadline=None)
def test_sanitize_is_idempotent(u):
    once = sanitize_url(u)
    assert sanitize_url(once) == once


@given(urls())
@settings(max_examples=300, deadline=None)
def test_sanitize_output_is_valid_and_dotfree(u):
    s = sanitize_url(u)
    validate_url(s)  # raises ValueError on an invalid URL (se/url.py:168-173)
    # RFC 3986 dot-segment removal: no '.'/'..' segments survive in the path
    path = s.split("://", 1)[1].split("?", 1)[0]
    segs = path.split("/")[1:]
    assert "." not in segs and ".." not in segs


@given(st.from_regex(r"(/[A-Za-z0-9.]{0,6}){0,6}/?", fullmatch=True))
@settings(max_examples=300, deadline=None)
def test_norm_url_path_idempotent_and_anchored(p):
    once = norm_url_path(p)
    assert norm_url_path(once) == once
    assert once.startswith("/") or once == ""
    if p.endswith("/") and not p.rstrip("/").endswith((".", "..")):
        assert once.endswith("/")  # trailing slash is meaningful, kept


@given(urls(), st.from_regex(r"[A-Za-z0-9./_-]{0,16}", fullmatch=True))
@settings(max_examples=300, deadline=None)
def test_absolutize_produces_absolute_canonical(base, link):
    out = absolutize_url(sanitize_url(base), link)
    if out is not None:
        assert out.startswith("http://") or out.startswith("https://")
        # absolutize output is already canonical — a second sanitize is a no-op
        assert sanitize_url(out) == out


@given(urls())
@settings(max_examples=200, deadline=None)
def test_absolutize_self_is_identity(u):
    s = sanitize_url(u)
    assert absolutize_url(s, s) == s
