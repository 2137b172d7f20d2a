"""Fetch stage: Arrow-batched deterministic fetcher (BrowserMock analog).

Reference parity:
  * redirect following with max_redirects=5 → TooManyRedirects
    (se/browser_request.py:190-239, sosse/conf.py:356-360)
  * page-size guard → PageTooBig (se/browser_request.py:146-165)
  * per-host session reuse — one session per hostname
    (se/browser_request.py:115-144) ≙ executor-local dict living across
    Arrow batches inside one mapInPandas task
  * error capture → error text + md5 hash (se/document.py:579-584)

The fetcher is a pure function of (URL, cookie header) — webgraph.
fetch_sim + corpus render — so crawl runs are exactly reproducible: the
analog of se/test_mock.py's URL→bytes map, at any scale, with zero
stored state.  Form auth (try_auth, se/browser_request.py:242-287) runs
as a second bounded kernel over just the login-redirected slice.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sosse_spark.functions.images import encode_image, phash64, render_pattern
from sosse_spark.functions.images import decode_image
from sosse_spark.sources.corpus import caption_for, dims_for, fmt_for, image_id_for
from sosse_spark.sources.webgraph import (
    WebConfig,
    _host_of_url,
    favicon_of,
    fetch_sim,
    html_page,
    max_age_of,
    robots_body,
)
from sosse_spark.operators.robots import robots_rules_rows

__all__ = [
    "FETCH_SCHEMA",
    "fetch_batch",
    "auth_and_fetch",
    "fetch_robots_for_domains",
    "fetch_favicons_for_domains",
    "fetch_favicons_for_urls",
    "fetch_previews_for_urls",
    "PREVIEW_FETCH_SCHEMA",
]

FETCH_SCHEMA = (
    "url string, final_url string, redirect_count int, error string, "
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, title string, phash bigint, links array<string>, "
    "max_age bigint, favicon_url string, "
    "preview_url string, preview_kind string, preview_inline_len int, "
    "set_cookies array<struct<name:string,value:string,domain_attr:string,"
    "path:string,secure:boolean,origin_url:string>>"
)


def _fetch_row(url: str, cfg: WebConfig, cookie: str | None) -> dict:
    res = fetch_sim(url, cfg, cookie)
    row = {
        "url": url,
        "final_url": res.final_url,
        "redirect_count": res.redirect_count,
        "error": res.error,
        "image_id": None,
        "bytes": None,
        "w": None,
        "h": None,
        "fmt": None,
        "caption": None,
        "title": None,
        "phash": None,
        "links": res.links,
        "max_age": None,
        "favicon_url": None,
        "preview_url": None,
        "preview_kind": None,
        "preview_inline_len": None,
        "set_cookies": [],
    }
    if res.error is None and res.doc_index is not None:
        i = res.doc_index
        if cfg.html_mode:
            # html_mode: the page is real HTML — run the P2 DOM-walk
            # kernel (se/page.py:103-233 semantics) right here in the
            # Arrow batch: caption ≙ Document.content (assembled text,
            # anchor text included), title from <title>, links already
            # base-resolved (se/page.py:88-95) so the downstream
            # absolutize vs final_url is an identity pass
            from sosse_spark.operators.feedparse import feed_html, parse_feed
            from sosse_spark.operators.htmlparse import parse_html
            from sosse_spark.sources.webgraph import feed_page, serves_feed

            html = (
                feed_page(i, cfg, caption_for(i))
                if serves_feed(i, cfg)
                else html_page(i, cfg, caption_for(i))
            )
            # content-sniffed feed routing (se/document.py:327-345,463):
            # a parseable feed with >=1 entry re-renders as the
            # template-shaped page BEFORE the DOM walk; everything else
            # (including an empty feed — the reference's early return)
            # flows through the HTML path unchanged
            parsed_feed = parse_feed(html)
            if parsed_feed is not None:
                html = feed_html(parsed_feed)
            parsed = parse_html(res.final_url, html, with_preview=True)
            row.update(
                image_id=image_id_for(i),
                bytes=html.encode("utf-8"),
                fmt="html",
                caption=parsed["text"],
                title=parsed["title"],
                links=[l["abs_url"] for l in parsed["links"]],
                max_age=max_age_of(i, cfg),
                # P8 <link rel~=icon> selection from the parsed head
                # (FavIcon.extract url derivation, se/models.py:383-391)
                favicon_url=parsed["favicon"],
                # P9 preview candidate off the same tree (se/document_
                # meta.py:98-106): data: URIs decoded in-kernel, http
                # candidates resolved by the per-round preview fetch
                preview_url=parsed["preview_url"],
                preview_kind=parsed["preview_kind"],
                preview_inline_len=parsed["preview_inline_len"],
            )
        else:
            w, h = dims_for(i)
            fmt = fmt_for(i)
            data = encode_image(render_pattern(i, w, h), fmt)
            row.update(
                image_id=image_id_for(i),
                bytes=data,
                w=w,
                h=h,
                fmt=fmt,
                caption=caption_for(i),
                title=None,  # caption ≡ title under the image graft (P7)
                phash=phash64(decode_image(data, fmt)),
                max_age=max_age_of(i, cfg),
            )
    return row


def _error_row(url: str, error: str) -> dict:
    """A FETCH_SCHEMA error row built directly — no network/simulated
    fetch behind it (used when the outcome is already known, e.g. a
    failed login POST)."""
    return {
        "url": url,
        "final_url": url,
        "redirect_count": 0,
        "error": error,
        "image_id": None,
        "bytes": None,
        "w": None,
        "h": None,
        "fmt": None,
        "caption": None,
        "title": None,
        "phash": None,
        "links": [],
        "max_age": None,
        "favicon_url": None,
        "preview_url": None,
        "preview_kind": None,
        "preview_inline_len": None,
        "set_cookies": [],
    }


def _int64_fix(rows: list[dict]) -> pd.DataFrame:
    # CRITICAL: construct with dtype=object FIRST — a batch mixing
    # success rows with error/redirect rows (phash=None) would
    # otherwise coerce int64 → float64 at construction and silently
    # corrupt low bits of large phashes; Int64 cast from object is
    # exact.
    out = pd.DataFrame(rows, dtype=object)
    for col in ("phash", "w", "h", "redirect_count", "max_age", "preview_inline_len"):
        out[col] = out[col].astype("Int64")
    return out


def fetch_batch(claimed: DataFrame, cfg: WebConfig) -> DataFrame:
    """mapInPandas over the claimed batch; emits payload + raw hrefs.
    When the batch carries a `cookie_header` column (jar-matched
    cookies, se/browser_request.py:76-97 analog), each request sends it."""
    has_cookies = "cookie_header" in claimed.columns
    cols = ["url", "cookie_header"] if has_cookies else ["url"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sessions: dict[str, int] = {}  # per-host session reuse analog
        for pdf in batches:
            rows = []
            hdrs = pdf["cookie_header"] if has_cookies else [None] * len(pdf)
            for url, hdr in zip(pdf["url"], hdrs):
                host = url.split("/", 3)[2] if url.startswith("http") else ""
                sessions[host] = sessions.get(host, 0) + 1
                cookie = None if hdr is None or (isinstance(hdr, float)) else hdr
                rows.append(_fetch_row(url, cfg, cookie))
            yield _int64_fix(rows)

    return claimed.select(*cols).mapInPandas(run, FETCH_SCHEMA)


def auth_and_fetch(rows: DataFrame, cfg: WebConfig, auth_fields: dict) -> DataFrame:
    """Form authentication + refetch for URLs whose fetch redirected to
    the login page (try_auth, se/browser_request.py:242-287 +
    collection.url_get reopen, se/collection.py:347-365):

      GET login page → scrape form inputs → overlay Collection
      authfields → absolutize the form action → POST → follow the 302
      with the fresh session cookie → REFETCH the original URL.

    Emits one FETCH_SCHEMA row per original URL, carrying the cookies
    the login response set (the caller upserts them into the jar).
    Input: (url, final_url) where final_url is the login redirect."""
    from sosse_spark.functions.urlnorm import absolutize_url
    from sosse_spark.sources.webgraph import login_form, login_post

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out = []
            for url, login_url in zip(pdf["url"], pdf["final_url"]):
                host = _host_of_url(login_url)
                next_path = login_url.split("next=", 1)[-1] if "next=" in login_url else "/"
                form = login_form(host)
                payload = dict(form["inputs"])
                payload.update(auth_fields)
                # the POST target must absolutize like the reference
                # does; the synthetic server validates the endpoint, so
                # a broken absolutize surfaces as a per-row auth error
                # (never a task-killing assert inside the kernel)
                post_url = absolutize_url(login_url, form["action"])
                set_cookies, location = login_post(host, payload, next_path, post_url)
                if location is None:
                    # credential failure: no refetch — it would only
                    # re-hit the login wall to be overwritten by the
                    # error anyway.  Distinct message from the
                    # reference's AuthElemFailed, which it reserves for
                    # form-SELECTOR failures (se/browser_request.py:
                    # 252-257); a bad-credentials POST just doesn't 302.
                    row = _error_row(url, "AuthFailed: no redirect after login POST")
                else:
                    # the fresh session cookie rides the refetch directly
                    # (requests keeps it in the live session jar)
                    cookie = "; ".join(f"{c['name']}={c['value']}" for c in set_cookies)
                    row = _fetch_row(url, cfg, cookie)
                    # origin_url: the cookie belongs to the RESPONDING
                    # login host — a redirect chain can land on another
                    # host than the frontier URL's, and attributing the
                    # cookie to the origin host would clobber jar keys
                    # across auth hosts and re-auth every round
                    row["set_cookies"] = [
                        {**c, "origin_url": post_url} for c in set_cookies
                    ]
                rows_out.append(row)
            yield _int64_fix(rows_out)

    return rows.select("url", "final_url").mapInPandas(run, FETCH_SCHEMA)


ROBOTS_FETCH_SCHEMA = "domain string, kind string, pattern string, pattern_len int"


def fetch_robots_for_domains(domains: DataFrame, cfg: WebConfig) -> DataFrame:
    """Fetch+parse robots.txt for each new domain (se/domain.py:175-191);
    distributed — one Arrow batch of domains in, rules rows out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for domain in pdf["url_domain"]:
                try:
                    host = int(domain.split(".")[0].removeprefix("img"))
                except ValueError:
                    host = -1
                body = robots_body(host, cfg) if host >= 0 else None
                rows.extend(robots_rules_rows(domain, body))
            yield pd.DataFrame(rows, columns=["domain", "kind", "pattern", "pattern_len"])

    return domains.select("url_domain").distinct().mapInPandas(run, ROBOTS_FETCH_SCHEMA)


FAVICON_FETCH_SCHEMA = (
    "domain string, favicon_url string, mimetype string, missing boolean, content_len int"
)


def fetch_favicons_for_domains(domains: DataFrame, cfg: WebConfig) -> DataFrame:
    """Fetch /favicon.ico once per new domain (P8: FavIcon.extract,
    se/models.py:383-440 — url-unique cache, `missing` flag on 404).
    Same distributed shape as the robots fetch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for domain in pdf["url_domain"]:
                try:
                    host = int(domain.split(".")[0].removeprefix("img"))
                except ValueError:
                    host = -1
                fav = favicon_of(host, cfg) if host >= 0 else None
                if fav is None:
                    rows.append(
                        {
                            "domain": domain,
                            "favicon_url": f"http://{domain}/favicon.ico",
                            "mimetype": None,
                            "missing": True,
                            "content_len": None,
                        }
                    )
                else:
                    data = encode_image(render_pattern(fav, 16, 16), "png")
                    rows.append(
                        {
                            "domain": domain,
                            "favicon_url": f"http://{domain}/favicon.ico",
                            "mimetype": "image/png",
                            "missing": False,
                            "content_len": len(data),
                        }
                    )
            out = pd.DataFrame(rows, dtype=object)
            out["content_len"] = out["content_len"].astype("Int64")
            out["missing"] = out["missing"].astype("bool")
            yield out

    return domains.select("url_domain").distinct().mapInPandas(run, FAVICON_FETCH_SCHEMA)


def _magic_mime(data: bytes):
    """Magic-number mimetype sniff for the fetched-favicon gate
    (FavIcon.extract uses python-magic, se/models.py:412-416; only the
    image formats the engine can meet need recognizing)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if data[:3] == b"GIF":
        return "image/gif"
    if data[:2] == b"\xff\xd8":
        return "image/jpeg"
    if data[:4] == b"\x00\x00\x01\x00":
        return "image/vnd.microsoft.icon"
    if data[:2] in (b"BM",):
        return "image/bmp"
    return "application/octet-stream"


def fetch_favicons_for_urls(urls: DataFrame, cfg: WebConfig) -> DataFrame:
    """P8 html_mode favicon resolution, keyed by the PAGE-DECLARED icon
    URL (FavIcon.extract, se/models.py:383-422 — get_or_create(url=url)
    makes the favicon cache url-unique, not domain-unique):

      * ``data:`` URIs decode in place — ``data:<mime>;base64,<data>``
        → declared mimetype + b64decoded content, missing=False; a
        non-base64 encoding or a decode error leaves missing=True
        (the reference's bare try/except, se/models.py:400-420);
      * http(s) URLs fetch once each; the content must magic-sniff to
        image/* to store (se/models.py:412-416), else missing=True.

    Input: one column ``favicon_url`` (already distinct + anti-joined
    against the favicons table by the caller).  Same mapInPandas shape
    as the domain variant; the ``domain`` column carries the icon
    host (NULL for data: URIs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import base64

        for pdf in batches:
            rows = []
            for fav_url in pdf["favicon_url"]:
                row = {
                    "domain": None,
                    "favicon_url": fav_url,
                    "mimetype": None,
                    "missing": True,
                    "content_len": None,
                }
                if fav_url.startswith("data:"):
                    try:
                        spec = fav_url.split(":", 1)[1]
                        mimetype, rest = spec.split(";", 1)
                        encoding, payload = rest.split(",", 1)
                        if encoding != "base64":
                            raise ValueError(f"encoding {encoding} not supported")
                        data = base64.b64decode(payload, validate=True)
                        row.update(
                            mimetype=mimetype, missing=False, content_len=len(data)
                        )
                    except Exception:
                        pass  # missing stays True (se/models.py:418-419)
                else:
                    try:
                        domain = fav_url.split("/", 3)[2]
                    except IndexError:
                        domain = None
                    row["domain"] = domain
                    try:
                        host = int(domain.split(".")[0].removeprefix("img"))
                    except (ValueError, AttributeError):
                        host = -1
                    fav = favicon_of(host, cfg) if host >= 0 else None
                    if fav is not None:
                        data = encode_image(render_pattern(fav, 16, 16), "png")
                        mime = _magic_mime(data)
                        # a non-image body leaves missing=True with no
                        # content recorded (se/models.py:413-416 gate)
                        if mime.startswith("image/"):
                            row.update(
                                mimetype=mime, missing=False, content_len=len(data)
                            )
                rows.append(row)
            out = pd.DataFrame(rows, dtype=object)
            out["content_len"] = out["content_len"].astype("Int64")
            out["missing"] = out["missing"].astype("bool")
            yield out

    return urls.select("favicon_url").distinct().mapInPandas(run, FAVICON_FETCH_SCHEMA)


PREVIEW_FETCH_SCHEMA = (
    "preview_url string, mimetype string, missing boolean, "
    "content_len int, w int, h int"
)


def fetch_previews_for_urls(urls: DataFrame, cfg: WebConfig) -> DataFrame:
    """P9 preview-image resolution for http(s) candidates the parse
    kernel chose (the network half of DocumentMeta.preview_file_from_url,
    se/document_meta.py:64-78): fetch once per DISTINCT preview URL,
    require a 200 + an image/* magic sniff to store; anything else
    leaves missing=True and the document keeps has_thumbnail=False
    (create_preview's silent-failure arm).  ``w``/``h`` carry the
    decoded dimensions so the 160×100 thumbnail geometry
    (preview.thumb_size_cols) stays pure column algebra downstream.

    Input: one column ``preview_url`` (already distinct + anti-joined
    against the previews table by the caller).  Same mapInPandas shape
    as the favicon fetchers.  Synthetic web: ``/meta/{i}.png`` serves
    the doc-i pattern at dims_for(i); ``/meta/missing/...`` 404s."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for purl in pdf["preview_url"]:
                row = {
                    "preview_url": purl,
                    "mimetype": None,
                    "missing": True,
                    "content_len": None,
                    "w": None,
                    "h": None,
                }
                tail = purl.rsplit("/", 1)[-1]
                doc_i = None
                if "/meta/missing/" not in purl and "/meta/" in purl:
                    try:
                        doc_i = int(tail.split(".", 1)[0])
                    except ValueError:
                        doc_i = None
                if doc_i is not None and 0 <= doc_i < cfg.n_docs:
                    w, h = dims_for(doc_i)
                    data = encode_image(render_pattern(doc_i, w, h), "png")
                    mime = _magic_mime(data)
                    # non-image body → missing stays True
                    # (se/document_meta.py:70-72 magic gate)
                    if mime.startswith("image/"):
                        row.update(
                            mimetype=mime,
                            missing=False,
                            content_len=len(data),
                            w=w,
                            h=h,
                        )
                rows.append(row)
            out = pd.DataFrame(rows, dtype=object)
            for col in ("content_len", "w", "h"):
                out[col] = out[col].astype("Int64")
            out["missing"] = out["missing"].astype("bool")
            yield out

    return urls.select("preview_url").distinct().mapInPandas(run, PREVIEW_FETCH_SCHEMA)
