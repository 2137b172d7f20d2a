"""URL canonicalization kernel (reference parity: /root/reference/se/url.py).

This module defines **URL-seen identity** for the whole engine: two URLs
are the same frontier entry iff their canonical forms are equal.  The
semantics re-derive the reference's conventions (golden vectors in
se/test_url.py:29-228):

  * RFC 3986 dot-segment removal, preserving a trailing "/"
    (se/url.py:25-55, vectors se/test_url.py:127-141)
  * percent-encoding normalization without double-escaping; query
    re-encoded with quote_plus keeping "&=" (se/url.py:66-96)
  * IDNA/punycode netloc normalization (se/url.py:86-91)
  * lenient scheme handling: "//x", "://x", "http:x" fixups, empty path
    becomes "/" (se/url.py:99-113)
  * RFC 3986 §5 reference resolution incl. params/query/fragment-only
    links (se/url.py:116-165, vectors se/test_url.py:142-207)

All kernels are plain-Python Series-level functions wrapped as Arrow
pandas UDFs (no per-row Python in the Spark plan); scalar forms exist
for unit tests and driver-side use.
"""

from __future__ import annotations

import re
from urllib.parse import quote, quote_plus, unquote, unquote_plus
from urllib.parse import urlsplit as _stdlib_urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

__all__ = [
    "norm_url_path",
    "sanitize_url",
    "lenient_urlparse",
    "absolutize_url",
    "validate_url",
    "has_browsable_scheme",
    "url_remove_query_string",
    "url_remove_fragment",
    "url_beautify",
    "url_host",
    "canonicalize_udf",
    "absolutize_udf",
    "browsable_udf",
    "valid_url_udf",
    "beautify_udf",
]

# RFC 3986 §3.1 scheme production.
_SCHEME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9+.]*:")

# Characters that never need (re-)escaping in a path; '%' included so
# already-encoded sequences are not double-escaped (se/url.py:74-79).
_PATH_SAFE = "%_.-~:/?#[]@!$&'()*+,;="

_VALID_URL_RE = re.compile(
    r"https?://[a-zA-Z0-9_-][a-zA-Z0-9\_\-\.]*(:[0-9]+)?"
    r"/[a-zA-Z0-9\%\_\.\-\~\/\?\#\[\]\@\!\$\&\'\(\)\*\+\,\;\=:]*$"
)


class _Parts:
    """Mutable split-URL record (scheme, netloc, path, params, query, fragment)."""

    __slots__ = ("scheme", "netloc", "path", "params", "query", "fragment")

    def __init__(self, scheme="", netloc="", path="", params="", query="", fragment=""):
        self.scheme = scheme
        self.netloc = netloc
        self.path = path
        self.params = params
        self.query = query
        self.fragment = fragment

    def copy(self) -> "_Parts":
        return _Parts(self.scheme, self.netloc, self.path, self.params, self.query, self.fragment)

    def geturl(self) -> str:
        url = ""
        if self.scheme:
            url = self.scheme + ":"
        if self.netloc or self.scheme in ("http", "https", "fake"):
            url += "//" + self.netloc
        url += self.path
        if self.params:
            url += ";" + self.params
        if self.query:
            url += "?" + self.query
        if self.fragment:
            url += "#" + self.fragment
        return url


def _split_params(path: str) -> tuple[str, str]:
    """Split `;params` off the final path segment (urllib urlparse rule)."""
    if ";" in path.rsplit("/", 1)[-1]:
        base, params = path.rsplit(";", 1)
        return base, params
    return path, ""


def lenient_urlparse(url: str) -> _Parts:
    """Parse with SOSSE's fixups: scheme-less '//'/' :/' URLs, bare
    'http:netloc', and netloc-only URLs get path '/'.
    (parity: se/url.py:99-113)"""
    if url.startswith("//") or url.startswith(":/"):
        fixed = "fake://" + url.lstrip(":").lstrip("/")
        s = _stdlib_urlsplit(fixed)
        path, params = _split_params(s.path)
        return _Parts("", s.netloc, path, params, s.query, s.fragment)

    if url.startswith("http:") or url.startswith("https:"):
        scheme, rest = url.split(":", 1)
        url = scheme + "://" + rest.lstrip("/")

    s = _stdlib_urlsplit(url)
    path, params = _split_params(s.path)
    p = _Parts(s.scheme, s.netloc, path, params, s.query, s.fragment)
    if p.netloc and p.path == "":
        p.path = "/"
    return p


def norm_url_path(path: str) -> str:
    """Dot-segment removal keeping the trailing '/' convention.
    (parity: se/url.py:25-55; vectors se/test_url.py:127-141)"""
    segs = path.split("/")
    trailing = segs[-1] in ("", ".", "..")
    out: list[str] = []
    for seg in segs:
        if seg in ("", "."):
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    if not out:
        return "/"
    return "/" + "/".join(out) + ("/" if trailing else "")


def url_remove_query_string(url: str) -> str:
    return url.split("?", 1)[0]


def url_remove_fragment(url: str) -> str:
    return url.split("#", 1)[0]


def sanitize_url(url: str) -> str:
    """Canonical form: percent-encoding + punycode + dot-segment
    normalization.  THE URL-seen identity. (parity: se/url.py:66-96)"""
    p = lenient_urlparse(url)

    if not p.scheme:
        raise ValueError(f"url has no scheme ({url})")
    if not p.netloc and not p.path:
        raise ValueError(f"url has no netloc and no path ({url})")

    p.path = quote(p.path, safe=_PATH_SAFE)
    p.query = quote_plus(unquote_plus(p.query), safe="&=")

    try:
        p.netloc.encode("ascii")
    except UnicodeEncodeError:
        try:
            p.netloc = p.netloc.encode("idna").decode()
        except UnicodeError:
            pass

    p.path = norm_url_path(p.path)
    return p.geturl()


def _dirname(path: str) -> str:
    d = path.rsplit("/", 1)[0]
    return d


def absolutize_url(base: str, link: str) -> str:
    """Resolve `link` against `base` per RFC 3986 §5 + SOSSE conventions.
    (parity: se/url.py:116-165; vectors se/test_url.py:78-217)"""
    if link.startswith("data:"):
        return link

    b = lenient_urlparse(base)
    l = lenient_urlparse(link)

    if l.scheme and not has_browsable_scheme(link):
        return link

    if l.scheme:
        target = l
    elif l.netloc:
        target = l.copy()
        target.scheme = b.scheme
    elif l.path:
        target = b.copy()
        if l.path.startswith("/"):
            target.path = l.path
        else:
            prefix = _dirname(b.path)
            if not prefix.endswith("/"):
                prefix += "/"
            target.path = prefix + l.path
        target.params = l.params
        target.query = l.query
        target.fragment = l.fragment
    else:
        # params/query/fragment-only reference
        target = b.copy()
        if l.params:
            target.path = _dirname(b.path) + "/"
            target.params = l.params
        if l.params or l.query:
            target.query = l.query
        if l.params or l.query or l.fragment:
            target.fragment = l.fragment
    return sanitize_url(target.geturl())


def validate_url(url: str) -> None:
    """Regex gate for seed/manual URLs (parity: se/url.py:168-173)."""
    if not _VALID_URL_RE.match(url):
        raise ValueError(f"URL must match the regular expression: {_VALID_URL_RE.pattern}")


def has_browsable_scheme(url: str) -> bool:
    """Keep only http/https/relative links (parity: se/url.py:180-193)."""
    try:
        lenient_urlparse(url)
    except ValueError:
        return False
    if url.startswith("#"):
        return False
    if _SCHEME_RE.match(url):
        return url.split(":", 1)[0] in ("http", "https")
    return True


def url_beautify(url: str) -> str:
    """Decoded display form (parity: se/url.py:196-202)."""
    p = lenient_urlparse(url)
    try:
        p.netloc = p.netloc.encode().decode("idna")
    except UnicodeError:
        pass
    p.path = unquote(p.path)
    p.query = unquote_plus(p.query)
    return p.geturl()


def url_host(url: str) -> str:
    """Hostname for politeness bucketing / robots lookup."""
    return lenient_urlparse(url).netloc


# ---------------------------------------------------------------------------
# Arrow-vectorized wrappers (Series in, Series out — no per-row Python
# visible to the Spark plan; the loop lives inside one Arrow batch).
# ---------------------------------------------------------------------------

def _canonicalize_series(urls: pd.Series) -> pd.Series:
    def one(u):
        if u is None:
            return None
        try:
            return sanitize_url(u)
        except ValueError:
            return None

    return urls.map(one)


def _absolutize_series(bases: pd.Series, links: pd.Series) -> pd.Series:
    def one(b, l):
        if b is None or l is None:
            return None
        try:
            return absolutize_url(b, l)
        except ValueError:
            return None

    return pd.Series([one(b, l) for b, l in zip(bases, links)])


def _browsable_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: has_browsable_scheme(u) if u is not None else False)


def _valid_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: bool(_VALID_URL_RE.match(u)) if u is not None else False)


def _beautify_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: url_beautify(u) if u is not None else None)


canonicalize_udf = F.pandas_udf(_canonicalize_series, StringType())
absolutize_udf = F.pandas_udf(_absolutize_series, StringType())
browsable_udf = F.pandas_udf(_browsable_series, BooleanType())
valid_url_udf = F.pandas_udf(_valid_series, BooleanType())
beautify_udf = F.pandas_udf(_beautify_series, StringType())
