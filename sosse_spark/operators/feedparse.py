"""RSS/Atom feed ingest parse (P4's second half).

The reference turns a fetched feed into a synthetic HTML page before the
standard parse (se/document.py:327-345 `_parse_xml`: feedparser + the
se/feed.html template — feed title becomes the page title, each entry
renders as `<li>[updated] <a href=entry.link>entry.title</a></li>`), so
feed entries flow through the SAME link-extraction/indexing pipeline as
any page.  This module re-expresses that with stdlib ElementTree inside
an Arrow mapInPandas kernel:

- ``feed_entries_batch`` → one structured row per entry (the relational
  form downstream operators join on);
- ``feed_html_batch``    → the reference-template-shaped HTML page, fed
  to operators/htmlparse.py's DOM walk exactly like html_mode pages.

Supported grammar: RSS 2.0 (`rss/channel/item`), Atom (`feed/entry`,
any namespace), and RSS 1.0/RDF (`rdf:RDF` root: `channel` metadata +
root-level `item` siblings, Dublin Core `dc:date` as the update stamp —
the normalization feedparser applies to RDF feeds).  The residual
feedparser superset (CDF, hand-rolled recovery of malformed XML) stays
out of scope and documented as a delta.  A document with zero parsed
entries is NOT treated as a feed (the reference's early return).
"""

from __future__ import annotations

import html as _html
from typing import Iterator, Optional
from xml.etree import ElementTree

from pyspark.sql import DataFrame

__all__ = [
    "FEED_ENTRIES_SCHEMA",
    "FEED_HTML_SCHEMA",
    "parse_feed",
    "feed_entries_batch",
    "feed_html",
    "feed_html_batch",
]


def _local(tag) -> str:
    """Strip any `{namespace}` prefix from an element tag."""
    if not isinstance(tag, str):
        return ""
    return tag.rsplit("}", 1)[-1]


def _child_text(node, name: str) -> Optional[str]:
    for ch in node:
        if _local(ch.tag) == name:
            return (ch.text or "").strip() or None
    return None


def _atom_link(node) -> Optional[str]:
    """Atom link selection: rel="alternate" wins, then the first
    rel-less link (feedparser's `link` resolution order)."""
    fallback = None
    for ch in node:
        if _local(ch.tag) != "link":
            continue
        href = (ch.get("href") or "").strip() or None
        rel = ch.get("rel")
        if rel == "alternate" and href:
            return href
        if rel is None and href and fallback is None:
            fallback = href
    return fallback


def parse_feed(content: str | bytes) -> Optional[dict]:
    """Parse one RSS 2.0 / Atom payload →
    ``{"kind", "title", "link", "description", "entries": [
        {"title", "link", "updated"}, ...]}``
    or None when the payload is not a feed with ≥1 entry (mirroring
    se/document.py:328-330's early return)."""
    if isinstance(content, bytes):
        content = content.decode("utf-8", errors="replace")
    try:
        root = ElementTree.fromstring(content)
    except ElementTree.ParseError:
        return None
    kind = _local(root.tag)
    if kind == "rss":
        chan = next((ch for ch in root if _local(ch.tag) == "channel"), None)
        if chan is None:
            return None
        entries = [
            {
                "title": _child_text(it, "title"),
                "link": _child_text(it, "link"),
                "updated": _child_text(it, "pubDate"),
            }
            for it in chan
            if _local(it.tag) == "item"
        ]
        parsed = {
            "kind": "rss",
            "title": _child_text(chan, "title"),
            "link": _child_text(chan, "link"),
            "description": _child_text(chan, "description"),
            "entries": entries,
        }
    elif kind == "feed":
        entries = [
            {
                "title": _child_text(en, "title"),
                "link": _atom_link(en),
                "updated": _child_text(en, "updated"),
            }
            for en in root
            if _local(en.tag) == "entry"
        ]
        parsed = {
            "kind": "atom",
            "title": _child_text(root, "title"),
            "link": _atom_link(root),
            "description": _child_text(root, "subtitle"),
            "entries": entries,
        }
    elif kind == "RDF":
        # RSS 1.0: metadata lives on a `channel` child; the items are
        # SIBLINGS of the channel at the RDF root (the rdf:Seq inside
        # channel/items only orders rdf:resource refs — feedparser
        # takes the item elements in document order, as we do here).
        chan = next((ch for ch in root if _local(ch.tag) == "channel"), None)
        entries = [
            {
                "title": _child_text(it, "title"),
                "link": _child_text(it, "link"),
                # Dublin Core dc:date is RSS 1.0's update stamp; local
                # name match covers any dc prefix binding.
                "updated": _child_text(it, "date"),
            }
            for it in root
            if _local(it.tag) == "item"
        ]
        parsed = {
            "kind": "rss10",
            "title": _child_text(chan, "title") if chan is not None else None,
            "link": _child_text(chan, "link") if chan is not None else None,
            "description": _child_text(chan, "description") if chan is not None else None,
            "entries": entries,
        }
    else:
        return None
    if not parsed["entries"]:
        return None
    return parsed


FEED_ENTRIES_SCHEMA = (
    "url string, feed_kind string, feed_title string, entry_no int, "
    "entry_title string, entry_url string, updated string"
)


def feed_entries_batch(
    df: DataFrame, url_col: str = "url", content_col: str = "content"
) -> DataFrame:
    """mapInPandas: (url, content) → one row per feed entry in document
    order (non-feeds contribute no rows)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for url, content in zip(pdf[url_col], pdf[content_col]):
                parsed = parse_feed(content)
                if parsed is None:
                    continue
                for no, entry in enumerate(parsed["entries"]):
                    out.append(
                        {
                            "url": url,
                            "feed_kind": parsed["kind"],
                            "feed_title": parsed["title"],
                            "entry_no": no,
                            "entry_title": entry["title"],
                            "entry_url": entry["link"],
                            "updated": entry["updated"],
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url",
                    "feed_kind",
                    "feed_title",
                    "entry_no",
                    "entry_title",
                    "entry_url",
                    "updated",
                ],
            )

    from sosse_spark.partitioning import fanout

    return fanout(df.select(url_col, content_col)).mapInPandas(run, FEED_ENTRIES_SCHEMA)


def feed_html(parsed: dict) -> str:
    """Render the se/feed.html template shape: optional `<title>`,
    `<h2>` feed title (linked when feed.link exists), description
    paragraph, then `<li>[updated] <a>entry.title</a></li>` per entry."""
    esc, attr = _html.escape, lambda s: _html.escape(s, quote=True)
    head = "<head><meta charset=\"utf-8\">"
    if parsed["title"]:
        head += f"<title>{esc(parsed['title'])}</title>"
    head += "</head>"
    body = "<body>"
    if parsed["title"]:
        if parsed["link"]:
            body += f"<h2><a href=\"{attr(parsed['link'])}\">{esc(parsed['title'])}</a></h2>"
        else:
            body += f"<h2>{esc(parsed['title'])}</h2>"
    if parsed["description"]:
        body += f"<p>{esc(parsed['description'])}</p>"
    body += "<p><ul>"
    for entry in parsed["entries"]:
        body += "<li>"
        if entry["updated"]:
            body += f"{esc(entry['updated'])} "
        body += f"<a href=\"{attr(entry['link'] or '')}\">{esc(entry['title'] or '')}</a></li>"
    body += "</ul></p></body>"
    return f"<!DOCTYPE html><html>{head}{body}</html>"


FEED_HTML_SCHEMA = "url string, title string, html string"


def feed_html_batch(
    df: DataFrame, url_col: str = "url", content_col: str = "content"
) -> DataFrame:
    """mapInPandas: (url, content) → (url, title, html) — the synthetic
    page the reference indexes in place of the raw feed (its title
    becomes the page title, se/document.py:336-338).  Non-feeds yield
    no rows; callers route those through the normal pipeline."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for url, content in zip(pdf[url_col], pdf[content_col]):
                parsed = parse_feed(content)
                if parsed is None:
                    continue
                out.append({"url": url, "title": parsed["title"], "html": feed_html(parsed)})
            yield pd.DataFrame(out, columns=["url", "title", "html"])

    return df.select(url_col, content_col).mapInPandas(run, FEED_HTML_SCHEMA)
