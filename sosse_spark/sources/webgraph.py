"""Synthetic crawl topology — the BrowserMock analog (se/test_mock.py:40-83).

A deterministic pure-function web over the image corpus: every doc index
i maps to a URL on a Zipf-skewed host; fetching that URL returns the
corpus payload (image bytes + caption) plus out-links in assorted
relative forms (exercising absolutize/sanitize, se/url.py:66-165),
redirect chains (cap 5 → TooManyRedirects, sosse/conf.py:356-360),
error injection (generic + PageTooBig, se/browser_request.py:146-165),
and per-host robots.txt (404 on most hosts, mirroring
se/test_mock.py:43-49; a deterministic subset serves a body with
Disallow/Allow/typo lines per se/domain.py:107-173 semantics).

Everything is a function of (i, n_docs, n_hosts) — no stored state, so
executors evaluate it locally with zero shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

__all__ = [
    "WebConfig",
    "host_no",
    "url_of",
    "doc_index_of",
    "out_links",
    "html_page",
    "max_age_of",
    "favicon_of",
    "robots_body",
    "fetch_sim",
    "auth_required",
    "session_cookie_value",
    "login_form",
    "login_post",
    "AUTH_COOKIE",
    "AUTH_PASSWORD",
]

_KNUTH = 2654435761


@dataclass(frozen=True)
class WebConfig:
    n_docs: int = 1000
    n_hosts: int = 10
    zipf_alpha: float = 3.0  # host = floor(H * u^alpha): higher = more skew
    max_redirects: int = 5  # parity: sosse/conf.py:356-360
    robots_host_mod: int = 4  # hosts with host_no % mod == 0 serve robots.txt
    redirect_mod: int = 50  # doc i has a redirect chain iff i % mod == 1
    error_mod: int = 100  # i % mod == 3 → generic error; == 7 → PageTooBig
    private_mod: int = 17  # i % mod == 0 → doc lives under /private/
    # hosts with host % mod == 1 gate /private/ behind a session cookie
    # (== 1 so auth hosts never coincide with robots hosts, mod 4 == 0);
    # 0 disables the auth surface entirely (default: existing behavior)
    auth_host_mod: int = 0
    # serve real HTML pages instead of the image payload: the fetch
    # stage then runs the P2 DOM-walk kernel (operators/htmlparse) for
    # text + links instead of the synthetic out-link function
    html_mode: bool = False
    # html_mode only: docs with i % feed_every == 0 serve an RSS/Atom
    # feed whose entries carry the SAME out-links — the fetch stage
    # routes them through the feedparse kernel and re-renders before
    # the DOM walk (se/document.py:327-345).  0 disables feeds.
    feed_every: int = 0


def _uniform(i: int) -> float:
    return ((i * _KNUTH) % (1 << 32)) / float(1 << 32)


def host_no(i: int, cfg: WebConfig) -> int:
    """Zipf-ish skewed host assignment: u^alpha concentrates mass on
    low-numbered hosts (host 0 is the hot host — the skew the north rule
    requires salting for)."""
    u = _uniform(i)
    return min(int(cfg.n_hosts * (u ** cfg.zipf_alpha)), cfg.n_hosts - 1)


def _path_of(i: int, cfg: WebConfig) -> str:
    if i % cfg.private_mod == 0 and i > 0:
        return f"/private/doc/{i:012d}"
    return f"/doc/{i:012d}"


def url_of(i: int, cfg: WebConfig) -> str:
    return f"http://img{host_no(i, cfg)}.example.com{_path_of(i, cfg)}"


def doc_index_of(url: str, cfg: WebConfig) -> Optional[int]:
    """Inverse of url_of for canonical URLs; None for non-doc URLs."""
    try:
        tail = url.rsplit("/", 1)[-1]
        i = int(tail)
    except (ValueError, IndexError):
        return None
    if 0 <= i < cfg.n_docs and url == url_of(i, cfg):
        return i
    return None


def out_links(i: int, cfg: WebConfig) -> list[str]:
    """Deterministic hrefs AS WRITTEN IN THE PAGE (pre-canonicalization):
    cycles through absolute / protocol-relative / path-relative /
    dot-relative / query+fragment forms so the URL kernel is exercised
    on every page.  Order is the page's link order (link_no ordinal,
    se/page.py:173-179)."""
    k = i % 4
    links = []
    for j in range(k):
        t = (i * 31 + 7 + j * 12347) % cfg.n_docs
        t_host = host_no(t, cfg)
        t_path = _path_of(t, cfg)
        form = (i + j) % 5
        if form == 0:
            links.append(f"http://img{t_host}.example.com{t_path}")
        elif form == 1:
            links.append(f"//img{t_host}.example.com{t_path}")
        elif form == 2 and t_host == host_no(i, cfg):
            # same-host path-relative with dot segments
            links.append(f".{t_path}" if _path_of(i, cfg).count("/") == 2 else f"..{t_path}")
        elif form == 3:
            links.append(f"http://img{t_host}.example.com{t_path}?utm=1&x=2#frag")
        else:
            links.append(f"http://img{t_host}.example.com/other/../{t_path.lstrip('/')}")
    return links


# a valid 1x1 transparent PNG, base64 (exercises the data:-URI favicon
# decode path, se/models.py:400-409)
DATA_URI_ICON = (
    "data:image/png;base64,iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)

# the same PNG as a P9 preview payload (the data:-arm of
# DocumentMeta.preview_file_from_url, se/document_meta.py:55-64)
DATA_URI_PREVIEW = DATA_URI_ICON


def preview_meta_of(i: int, cfg: WebConfig) -> str:
    """P9 preview-meta arms of doc i (DocumentMeta.get_preview_urls
    surface, se/document_meta.py:32-47), all deterministic in i:

      * ``i % 9 == 3`` — an OpenGraph image pointing at an http
        preview asset (``/meta/{i}.png`` on the doc's own host) plus an
        og:description; the ``i % 27 == 3`` subset points at
        ``/meta/missing/{i}.png``, which the preview fetch 404s
        (has_thumbnail stays False — the reference's failed
        preview_file_from_url arm);
      * ``i % 9 == 6`` — a TwitterCard data:-URI image (decodes in the
        parse kernel, no fetch);
      * otherwise no preview metadata (create_preview yields nothing).
    """
    if i % 9 == 3:
        path = f"/meta/missing/{i}.png" if i % 27 == 3 else f"/meta/{i}.png"
        return (
            f'<meta property="og:image" content="http://img{host_no(i, cfg)}'
            f'.example.com{path}">'
            f'<meta property="og:description" content="preview of doc {i}">'
        )
    if i % 9 == 6:
        return f'<meta name="twitter:image" content="{DATA_URI_PREVIEW}">'
    return ""


def html_page(i: int, cfg: WebConfig, title: str) -> str:
    """Real-HTML rendering of doc i (cfg.html_mode): the SAME out-links
    as the synthetic graph, written as anchors in their original
    absolute/relative forms so URL resolution is identical to the
    synthetic path.  On top, the page exercises the P2 parse surface:
    a <title>; a <nav> boilerplate whose link is a SELF-link (flagged
    in_nav, suppressed from text, and — like the reference's
    ``target_doc != document`` guard, se/page.py:170 — storing no link
    row); every fifth page a self-base ``<base>`` tag (the base-href
    parse path runs; resolution is unchanged because the base IS the
    page's own path); the title as a block <div>; anchors inside a <p>.
    """
    links = out_links(i, cfg)
    anchors = " ".join(f'<a href="{h}">link {j}</a>' for j, h in enumerate(links))
    base = f'<base href="{_path_of(i, cfg)}">' if i % 5 == 2 else ""
    nav = f'<nav>site menu <a href="{_path_of(i, cfg)}">self</a></nav>'
    # P8 icon-link variants (FavIcon._get_url selection, se/models.py:
    # 424-440): a data:-URI icon, a rel="shortcut icon", a multi-icon
    # head preferring sizes=32x32, and no declaration (default
    # /favicon.ico) — all deterministic in i
    if i % 7 == 0:
        icon = f'<link rel="icon" href="{DATA_URI_ICON}">'
    elif i % 7 == 1:
        icon = '<link rel="shortcut icon" href="/fav/classic.ico">'
    elif i % 7 == 2:
        icon = (
            '<link rel="icon" sizes="16x16" href="/fav/small.png">'
            '<link rel="icon" sizes="32x32" href="/fav/big.png">'
        )
    else:
        icon = ""
    preview = preview_meta_of(i, cfg)
    return (
        f"<html><head><title>{title}</title>{base}{icon}{preview}</head>"
        f"<body>{nav}<div>{title}</div><p>{anchors}</p></body></html>"
    )


def serves_feed(i: int, cfg: WebConfig) -> bool:
    return cfg.html_mode and cfg.feed_every > 0 and i % cfg.feed_every == 0


def feed_page(i: int, cfg: WebConfig, title: str) -> str:
    """RSS (even i) / Atom (odd i) rendering of doc i: the SAME
    out-links as the synthetic graph become feed entries with the SAME
    anchor text the html anchors carry ("link {j}"), and the feed-level
    link is the page's own path — it renders as the template's <h2>
    anchor, which (like html_page's nav self-anchor) is a self-link and
    stores no link row.  A zero-out-link doc yields a feed with no
    entries, which the parser rejects (the reference's early return) —
    the raw XML then falls through the normal HTML path, still
    producing no links."""
    from xml.sax.saxutils import escape, quoteattr

    links = out_links(i, cfg)
    self_link = _path_of(i, cfg)
    if i % 2 == 0:
        items = "".join(
            f"<item><title>link {j}</title><link>{escape(h)}</link>"
            f"<pubDate>2024-01-01T00:00:0{j}Z</pubDate></item>"
            for j, h in enumerate(links)
        )
        return (
            f'<rss version="2.0"><channel><title>{escape(title)}</title>'
            f"<link>{escape(self_link)}</link>"
            f"<description>feed for doc {i}</description>{items}</channel></rss>"
        )
    entries = "".join(
        f"<entry><title>link {j}</title><link href={quoteattr(h)}/>"
        f"<updated>2024-01-01T00:00:0{j}Z</updated></entry>"
        for j, h in enumerate(links)
    )
    return (
        f'<feed xmlns="http://www.w3.org/2005/Atom"><title>{escape(title)}</title>'
        f"<link href={quoteattr(self_link)}/><subtitle>feed for doc {i}</subtitle>"
        f"{entries}</feed>"
    )


def max_age_of(i: int, cfg: WebConfig) -> Optional[int]:
    """Synthetic Cache-Control max-age: every third doc serves one
    (exercises the P12 max-age freshness gate, se/html_cache.py:56-99);
    the rest have no cache-control (heuristic-rule path)."""
    return 7200 if i % 3 == 0 else None


def favicon_of(host: int, cfg: WebConfig) -> Optional[int]:
    """Doc index whose rendered image stands in for the host's favicon;
    None ⇒ 404 (mirrors the default favicon 404s of se/test_mock.py:43-49;
    extraction parity: FavIcon.extract, se/models.py:383-440)."""
    return host if host % 2 == 0 and host < cfg.n_docs else None


def robots_body(host: int, cfg: WebConfig) -> Optional[str]:
    """robots.txt body for hosts that serve one; None = 404 (allow-all,
    parity: empty/unfetchable robots ⇒ allow, se/domain.py:193-228)."""
    if host % cfg.robots_host_mod != 0:
        return None
    return (
        "# synthetic robots\n"
        "User-agent: sosse-spark\n"
        "Disallow: /private*\n"
        f"Allow: /private/ok$\n"
        "User-agent: *\n"
        "Dissallow: /private*\n"  # typo key, normalized per se/domain.py:119
    )


AUTH_COOKIE = "sosse_session"
AUTH_PASSWORD = "hunter2"  # one site-wide credential (≙ Collection authfields)


def auth_required(host: int, cfg: WebConfig) -> bool:
    """Whether this host's /private/ area needs a session cookie.
    `1 % mod` (not a literal 1) so auth_host_mod=1 gates EVERY host
    rather than silently gating none (x % 1 == 0 for all x)."""
    m = cfg.auth_host_mod
    return m > 0 and host % m == 1 % m


def session_cookie_value(host: int) -> str:
    return f"tok{host}"


def _login_url(host: int, next_path: str) -> str:
    return f"http://img{host}.example.com/login?next={next_path}"


def login_form(host: int) -> dict:
    """The login page's <form> as the auth kernel scrapes it (≙
    try_auth's input walk, se/browser_request.py:258-263): default
    input values incl. a per-host csrf token that MUST flow through,
    and a relative action that MUST be absolutized."""
    return {
        "action": "/login/post",
        "inputs": {"csrf": f"csrf-{host}", "user": "", "password": ""},
    }


def login_post(host: int, payload: dict, next_path: str, post_url: str | None = None):
    """POST the login form.  Success (posted to the right endpoint with
    csrf echoed + credentials) sets the session cookie and 302s to
    `next` (se/browser_request.py:275-287 shape); failure returns
    (no cookies, no redirect).  Validating `post_url` server-side makes
    the client's form-action absolutization observable per-row."""
    ok = (
        (post_url is None or post_url == f"http://img{host}.example.com/login/post")
        and payload.get("csrf") == f"csrf-{host}"
        and payload.get("user") == "admin"
        and payload.get("password") == AUTH_PASSWORD
    )
    if not ok:
        return [], None
    cookie = {
        "name": AUTH_COOKIE,
        "value": session_cookie_value(host),
        "domain_attr": None,  # host-only cookie
        "path": "/",
        "secure": False,
    }
    return [cookie], f"http://img{host}.example.com{next_path}"


def _host_of_url(url: str) -> int:
    try:
        return int(url.split("/", 3)[2].split(".")[0].removeprefix("img"))
    except (IndexError, ValueError):
        return -1


@dataclass
class FetchResult:
    url: str  # requested URL
    final_url: str  # after redirects (== url when no redirect)
    redirect_count: int = 0
    error: Optional[str] = None
    doc_index: Optional[int] = None
    links: list[str] = field(default_factory=list)
    is_login_page: bool = False


def fetch_sim(url: str, cfg: WebConfig, cookie: Optional[str] = None) -> FetchResult:
    """Simulate one fetch: redirect chain, error injection, auth gate,
    payload.  `cookie` is the request's Cookie header (or None).
    Deterministic; callable inside Arrow batches on executors."""
    # the login page is a real (payload-less) page so an unauthenticated
    # crawl that queues the redirect target still completes cleanly.
    # Served ONLY on hosts whose auth wall actually exists (the login
    # flow only ever points at auth_required hosts), and only at the
    # exact /login endpoint — on non-auth hosts, with auth off, or for
    # /login-bonus-style paths, the pre-auth behavior (404) is unchanged.
    path = url.split("/", 3)[3] if url.count("/") >= 3 else ""
    if (
        auth_required(_host_of_url(url), cfg)
        and (path == "login" or path.startswith("login?") or path.startswith("login/"))
    ):
        return FetchResult(url=url, final_url=url, is_login_page=True)

    i = doc_index_of(url, cfg)
    if i is None:
        return FetchResult(url=url, final_url=url, error="404 not found")

    if i % cfg.error_mod == 3:
        return FetchResult(url=url, final_url=url, doc_index=i, error="fetch error: connection reset")
    if i % cfg.error_mod == 7:
        return FetchResult(url=url, final_url=url, doc_index=i, error="PageTooBig")

    redirect_count = 0
    final_i = i
    if i % cfg.redirect_mod == 1:
        chain = i % 7
        if chain > cfg.max_redirects:
            return FetchResult(url=url, final_url=url, doc_index=i, error="TooManyRedirects")
        if chain > 0:
            redirect_count = chain
            final_i = (i + chain) % cfg.n_docs
            # the redirect target must itself be a plain page
            if final_i % cfg.redirect_mod == 1 or final_i % cfg.error_mod in (3, 7):
                final_i = (final_i + 1) % cfg.n_docs

    # auth gate on the FINAL doc: a redirect landing on a protected page
    # must hit the login wall exactly like a direct request (gating only
    # the requested doc would let any redirect circumvent the wall); the
    # login hop counts against max_redirects
    host = host_no(final_i, cfg)
    doc_path = _path_of(final_i, cfg)
    if doc_path.startswith("/private/") and auth_required(host, cfg):
        # exact name=value compare per header entry — a substring test
        # would false-grant when one host's token prefixes another's
        # (tok1 in tok11)
        granted = cookie is not None and (
            f"{AUTH_COOKIE}={session_cookie_value(host)}"
            in [p.strip() for p in cookie.split(";")]
        )
        if not granted:
            if redirect_count + 1 > cfg.max_redirects:
                return FetchResult(
                    url=url, final_url=url, doc_index=i, error="TooManyRedirects"
                )
            return FetchResult(
                url=url,
                final_url=_login_url(host, doc_path),
                redirect_count=redirect_count + 1,
                is_login_page=True,
            )

    return FetchResult(
        url=url,
        final_url=url_of(final_i, cfg),
        redirect_count=redirect_count,
        doc_index=final_i,
        links=out_links(final_i, cfg),
    )
