"""Real-HTML DOM walk — text + link extraction over actual HTML (P2).

Reference parity (se/page.py:103-233 ``Page.dom_walk`` / ``_dom_walk`` /
``_get_elem_text``), re-expressed as a pure-Python kernel over stdlib
``html.parser`` (no bs4/html5lib in the sandbox) so it runs vectorized
inside a ``mapInPandas`` stage — one Arrow batch of pages per task,
never a driver-side loop:

  * node skips: Doctype/Comment nodes and ``[document]/title/script/
    style`` elements contribute nothing (se/page.py:138-143);
    ``<template>`` subtrees are dropped before the walk
    (se/page.py:68-70).
  * nav suppression: inside ``nav/header/footer`` text is suppressed
    while links are still emitted, flagged ``in_nav`` (se/page.py:29,
    144-145 + Link.in_nav).
  * anchor text: ``<a>`` takes its text from ALL nested children,
    space-joined (``_get_elem_text`` recursion, se/page.py:103-114;
    golden: se/test_crawl.py:593-624 test_150_link_nested_text).
  * text assembly: a space is inserted between adjacent inline runs;
    block elements (``div p li h1-h6``) turn a trailing space into a
    newline or append one (se/page.py:150-153, 216-221).
  * links: every ``<a href>`` is emitted in document order with its
    char ``pos`` in the assembled text (captured BEFORE the anchor's
    own text lands, se/page.py:166-179), its text, ``in_nav``, and a
    ``browsable`` flag (has_browsable_scheme, se/url.py:180-193).
    Browsable hrefs are absolutized against the page's base URL —
    honoring ``<base href>`` (se/page.py:88-95; golden:
    se/test_crawl.py:338-362 test_008_base_header).  keep_params /
    fragment stripping (se/page.py:163-166) is left to the caller's
    column algebra, which already applies it to every candidate URL.
  * title: the first ``<title>`` element's direct text
    (se/browser_request.py:73).

Ordinals: the kernel numbers anchors ``a_no`` in document order.  The
reference's ``link_no`` counts only anchors that produced Link rows
(len(links), se/page.py:173) — which depends on admission, a downstream
relational decision here; the engine derives ``link_no`` with a
row_number over the surviving links ordered by ``a_no``, which
reproduces the reference numbering exactly (dropped candidates consume
no ordinal in either engine).

Scale shape: parsing is a narrow mapInPandas over (url, html) — no
shuffle, no state; one pass per page, output is thin (text + an array
of small structs).  At 100 TB the stage pipelines with the fetch stage
inside the same task set.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

import re

from sosse_spark.functions.urlnorm import (
    absolutize_url,
    has_browsable_scheme,
    url_remove_fragment,
    url_remove_query_string,
)

__all__ = [
    "parse_html",
    "parse_html_batch",
    "HTML_PARSE_SCHEMA",
    "sniff_is_html",
    "favicon_href",
    "favicon_url_of",
]

NAV_ELEMENTS = ("nav", "header", "footer")  # se/page.py:29
_SKIP_ELEMS = ("[document]", "title", "script", "style")  # se/page.py:141
_BLOCK_ELEMS = ("div", "p", "li", "h1", "h2", "h3", "h4", "h5", "h6")  # se/page.py:216
# HTML void elements: html.parser reports a start tag and no end tag —
# they must not stay open on the builder stack
_VOID_ELEMS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# html5lib (the reference's tree builder) closes an open <p>/<li> when a
# sibling block opens; html.parser reports tags verbatim, so the builder
# mirrors the cases the goldens exercise
_AUTOCLOSE = {
    "p": frozenset(("p", "div", "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6")),
    "li": frozenset(("li",)),
}


class _Node:
    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: dict):
        self.name = name
        self.attrs = attrs
        self.children: list = []  # _Node | str (text)


class _TreeBuilder(HTMLParser):
    """Lenient DOM: comments/doctype/PIs dropped at build time (the walk
    skips them in the reference, se/page.py:138-139)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        for opener, closers in _AUTOCLOSE.items():
            if tag in closers and self._stack[-1].name == opener:
                self._stack.pop()
                break
        node = _Node(tag, dict(attrs))
        self._stack[-1].children.append(node)
        if tag not in _VOID_ELEMS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for idx in range(len(self._stack) - 1, 0, -1):
            if self._stack[idx].name == tag:
                del self._stack[idx:]
                return
        # stray end tag: ignored (html5lib drops it too)

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def _build_tree(html: str) -> _Node:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


def _elem_text(node, recurse: bool = False) -> str:
    """``_get_elem_text`` (se/page.py:103-114): text nodes stripped; an
    ``<a>`` (or any element once recursing) space-joins its children."""
    if isinstance(node, str):
        return node.strip(" \t\n\r")
    s = ""
    if node.name == "a" or recurse:
        for child in node.children:
            _s = _elem_text(child, True)
            if _s:
                if s:
                    s += " "
                s += _s
    return s


def _find_first(node: _Node, name: str) -> Optional[_Node]:
    for child in node.children:
        if isinstance(child, _Node):
            if child.name == name:
                return child
            if child.name == "template":
                continue  # template subtrees are dropped pre-walk (se/page.py:68-70)
            found = _find_first(child, name)
            if found is not None:
                return found
    return None


def _base_url(url: str, root: _Node) -> str:
    """``Page.base_url`` (se/page.py:88-95): the first ``<base href>``
    re-bases link resolution (HTML only honors the first <base>)."""
    base = _find_first(root, "base")
    if base is not None and base.attrs.get("href"):
        try:
            return url_remove_fragment(absolutize_url(url, base.attrs["href"]))
        except ValueError:
            pass
    return url


def _find_all(node: _Node, name: str, out: list) -> list:
    for child in node.children:
        if isinstance(child, _Node):
            if child.name == name:
                out.append(child)
            if child.name == "template":
                continue
            _find_all(child, name, out)
    return out


_SHORTCUT_ICON_RE = re.compile("shortcut icon", re.IGNORECASE)
_ICON_RE = re.compile("icon", re.IGNORECASE)


def favicon_href(root: _Node) -> Optional[str]:
    """FavIcon._get_url (se/models.py:424-440): ``<link rel~=shortcut
    icon>`` first, else ``<link rel~=icon>``; among several, prefer
    sizes=32x32 then 16x16, else the first; None when the page
    declares no icon (the caller falls back to /favicon.ico)."""
    all_links = _find_all(root, "link", [])
    links = [l for l in all_links if _SHORTCUT_ICON_RE.search(l.attrs.get("rel") or "")]
    if not links:
        links = [l for l in all_links if _ICON_RE.search(l.attrs.get("rel") or "")]
    if not links:
        return None
    if len(links) == 1:
        return links[0].attrs.get("href")
    for preferred_size in ("32x32", "16x16"):
        for link in links:
            if link.attrs.get("sizes") == preferred_size:
                return link.attrs.get("href")
    return links[0].attrs.get("href")


def favicon_url_of(page_url: str, root: _Node) -> str:
    """FavIcon.extract's URL derivation (se/models.py:383-391): the
    selected href (default /favicon.ico) absolutized against the DOC
    url (not <base href> — the reference passes doc.url), then query
    string + fragment stripped.  data: URIs pass through absolutize
    untouched; their base64 alphabet contains no '?' or '#', so the
    strips are no-ops."""
    href = favicon_href(root) or "/favicon.ico"
    try:
        absolute = absolutize_url(page_url, href)
    except ValueError:
        absolute = "/favicon.ico"
        absolute = absolutize_url(page_url, absolute)
    return url_remove_query_string(url_remove_fragment(absolute))


def _title_of(root: _Node) -> Optional[str]:
    title = _find_first(root, "title")
    if title is None:
        return None
    direct = "".join(c for c in title.children if isinstance(c, str)).strip()
    return direct or None


class _WalkState:
    __slots__ = ("text", "links")

    def __init__(self) -> None:
        self.text = ""
        self.links: list[dict] = []


def _walk(node, state: _WalkState, base_url: str, remove_nav: bool, in_nav: bool) -> None:
    """``_dom_walk`` (se/page.py:130-221) over the stdlib tree."""
    if isinstance(node, str):
        s = node.strip(" \t\n\r")
        if state.text and state.text[-1] not in (" ", "\n") and s and not in_nav:
            state.text += " "
        if s and not in_nav:
            state.text += s
        return

    name = node.name
    if name in _SKIP_ELEMS or name == "template":
        return
    if remove_nav and name in NAV_ELEMENTS:
        in_nav = True

    if name == "a":
        s = _elem_text(node)
        if state.text and state.text[-1] not in (" ", "\n") and s and not in_nav:
            state.text += " "
        href = node.attrs.get("href")
        if href is not None and href.strip():
            href = href.strip()
            browsable = has_browsable_scheme(href)
            abs_url = None
            if browsable:
                try:
                    abs_url = absolutize_url(base_url, href)
                except ValueError:
                    abs_url = None
                    browsable = False
            else:
                # extern candidates keep a best-effort absolutized form
                # (se/page.py:186-191: absolutize, fall back to raw)
                try:
                    abs_url = absolutize_url(base_url, href)
                except ValueError:
                    abs_url = href
            state.links.append(
                {
                    "a_no": len(state.links),
                    "href": href,
                    "abs_url": abs_url,
                    "browsable": browsable,
                    "text": s,
                    "pos": len(state.text),
                    "in_nav": in_nav,
                }
            )
        if s and not in_nav:
            state.text += s
        return  # anchor children were consumed by _elem_text

    for child in node.children:
        _walk(child, state, base_url, remove_nav, in_nav)

    if name in _BLOCK_ELEMS:
        if state.text and not in_nav:
            if state.text[-1] == " ":
                state.text = state.text[:-1] + "\n"
            elif state.text[-1] != "\n":
                state.text += "\n"


def sniff_is_html(head: bytes | str) -> bool:
    """The ``<html`` / ``<!doctype html`` prefix check (se/page.py:49-55)."""
    if isinstance(head, bytes):
        head = head[: 1024 * 1024].decode("utf-8", errors="replace")
    h = head.strip().lower()
    return h.startswith("<html") or h.startswith("<!doctype html")


def parse_html(
    url: str,
    html: str | bytes,
    *,
    remove_nav: bool = True,
    store_extern_links: bool = False,
    with_preview: bool = False,
) -> dict:
    """Parse one page → ``{"title", "text", "base_url", "links"}``.

    ``links`` carries every candidate in document order; when
    ``store_extern_links`` is False, non-browsable candidates are
    dropped here (the reference only materializes them under
    ``store_extern_links``, se/page.py:183-198).  keep_params/fragment
    stripping is the caller's column algebra (it applies to every
    candidate URL uniformly)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    root = _build_tree(html)
    base = _base_url(url, root)
    state = _WalkState()
    for child in root.children:
        _walk(child, state, base, remove_nav, False)
    links = state.links
    if not store_extern_links:
        # dropped candidates consume NO ordinal (the reference numbers
        # only links it materializes, se/page.py:173) — renumber after
        # the filter
        links = [l for l in links if l["browsable"]]
        for i, l in enumerate(links):
            l["a_no"] = i
    out = {
        "title": _title_of(root),
        "text": state.text,
        "base_url": base,
        "links": links,
        "favicon": favicon_url_of(url, root),
    }
    if with_preview:
        # P9 preview metadata off the SAME tree (DocumentMeta.
        # get_preview_urls + the create_preview selection,
        # se/document_meta.py:32-106) — local import: preview.py
        # imports this module's tree helpers
        from sosse_spark.operators.preview import (
            preview_meta,
            preview_urls,
            select_preview,
        )

        meta = preview_meta(root)
        sel = select_preview(url, preview_urls(root, meta))
        out["preview_image"] = meta["image"]
        out["preview_description"] = meta["description"]
        out["preview_url"] = sel["chosen_url"]
        out["preview_kind"] = sel["chosen_kind"]
        out["preview_inline_len"] = (
            len(sel["inline"]) if sel["inline"] is not None else None
        )
    return out


HTML_PARSE_SCHEMA = (
    "url string, title string, text string, base_url string, "
    "links array<struct<a_no:int,href:string,abs_url:string,"
    "browsable:boolean,text:string,pos:int,in_nav:boolean>>, "
    "favicon string"
)


def parse_html_batch(
    pages,
    url_col: str = "url",
    content_col: str = "content",
    *,
    remove_nav: bool = True,
    store_extern_links: bool = False,
):
    """mapInPandas parse stage: (url, content) → HTML_PARSE_SCHEMA.
    Arrow-batched — the kernel never sees the driver."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for url, content in zip(pdf[url_col], pdf[content_col]):
                parsed = parse_html(
                    url,
                    content,
                    remove_nav=remove_nav,
                    store_extern_links=store_extern_links,
                )
                out.append(
                    {
                        "url": url,
                        "title": parsed["title"],
                        "text": parsed["text"],
                        "base_url": parsed["base_url"],
                        "links": parsed["links"],
                        "favicon": parsed["favicon"],
                    }
                )
            yield pd.DataFrame(
                out, columns=["url", "title", "text", "base_url", "links", "favicon"]
            )

    from sosse_spark.partitioning import fanout

    return fanout(pages.select(url_col, content_col)).mapInPandas(run, HTML_PARSE_SCHEMA)
