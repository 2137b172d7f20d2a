"""Q13: the REST search/CRUD surface as a thin driver API over tables
(se/rest_api.py:529-634 routers; se/search.py:80-229 param parsing).

The reference exposes `/api/{document,search,stats,lang_stats,
mime_stats,queue,tag}` DRF routers that all funnel into ONE queryset
builder, `get_documents` (se/search.py:95-229), driven by `ft/ff/fo/
fv/fc{N}` filter dicts.  This module mirrors that contract as pure
DataFrame composition: each endpoint returns a DataFrame (the driver
serializes however it likes), every filter maps onto the Q2-Q5
operators in operators/search.py, and nothing here adds a shuffle
beyond what the underlying operator needs.

Param contract (se/search.py:130-199):
  ft = inc | exc                 (include / NOT)
  ff = doc | content | title | url | mimetype |
       lto_url | lto_txt | lby_url | lby_txt | tag
  fo = contain | regexp | equal  (+ fc truthy → case-sensitive)
  fv = value
Incomplete filters (any of ft/ff/fo/fv missing) are SKIPPED, matching
the reference's REQUIRED_KEYS loop (se/search.py:131-138).  No query
and no filters → empty result (se/search.py:226-227).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sosse_spark.operators.search import (
    filter_predicate,
    lang_stats,
    mime_stats,
    multi_field_or,
    paginate,
    tag_rollup,
)

__all__ = [
    "RestApi",
    "FILTER_FIELDS",
    "hdd_stats",
    "OnlineStatus",
    "search_redirect_context",
    "archive_latest",
]

# se/search_form.py:38-49
FILTER_FIELDS = (
    "doc", "content", "title", "url", "mimetype",
    "lto_url", "lto_txt", "lby_url", "lby_txt", "tag",
)

_OPS = {"contain": "contain", "regexp": "regex", "equal": "exact"}
_IOPS = {"contain": "icontain", "regexp": "iregex", "equal": "iexact"}


class RestApi:
    """Driver-side facade over the engine's tables.

    ``docs`` needs (url, title, content, mimetype, lang, collection_id);
    ``links`` (src_url, dst_url, extern_url, text); ``tags``
    (tag_id, name, path); ``doc_tags`` (url, tag_id).  All optional
    except ``docs`` — endpoints touching a missing table raise.
    """

    def __init__(
        self,
        spark: SparkSession,
        docs: DataFrame,
        links: DataFrame | None = None,
        tags: DataFrame | None = None,
        doc_tags: DataFrame | None = None,
        metrics: DataFrame | None = None,
    ):
        self.spark = spark
        self.docs = docs
        self.links = links
        self.tags = tags
        self.doc_tags = doc_tags
        self.metrics = metrics

    # -- /api/search/ -----------------------------------------------------

    def search(
        self,
        q: str = "",
        params: list[dict] | None = None,
        doc_lang: str | None = None,
        collection_id: int | None = None,
        order_by: list[str] | None = None,
        page: int = 1,
        page_size: int = 20,
    ) -> DataFrame:
        """POST /api/search/ → se/rest_api.py:435-451 → get_documents."""
        out = self.docs
        has_query = False

        if q:
            from sosse_spark.operators.fts import fts_match_rank

            has_query = True
            out = fts_match_rank(out, q, text_col="content").drop("rank")

        for f in params or ():
            if not all(f.get(k) for k in ("ft", "ff", "fo", "fv")):
                continue  # se/search.py:131-138 — incomplete filters skipped
            has_query = True
            neg = f["ft"] == "exc"
            op = (_OPS if f.get("fc") else _IOPS)[f["fo"]]
            field, value = f["ff"], f["fv"]
            if field not in FILTER_FIELDS:
                raise ValueError(f"Invalid FILTER_FIELDS {field} / {list(FILTER_FIELDS)}")
            if field == "doc":
                pred = multi_field_or(
                    [F.col("content"), F.col("title"), F.col("url")], op, value
                )
                out = out.filter(~pred if neg else pred)
            elif field in ("lto_url", "lto_txt", "lby_url", "lby_txt"):
                out = self._link_filter(out, field, op, value, neg)
            elif field == "tag":
                out = self._tag_filter(out, op, value, neg)
            else:
                pred = filter_predicate(F.col(field), op, value)
                out = out.filter(~pred if neg else pred)

        if doc_lang:
            out = out.filter(F.col("lang") == doc_lang)
        if collection_id is not None:
            out = out.filter(F.col("collection_id") == collection_id)
        if not has_query:
            return out.limit(0)  # se/search.py:226-227

        order = [F.col(c[1:]).desc() if c.startswith("-") else F.col(c).asc()
                 for c in (order_by or ["url"])]
        order.append(F.col("url").asc())  # deterministic tiebreak (TEST_MODE id sort)
        return paginate(out.dropDuplicates(["url"]), order, page, page_size)

    def _link_filter(self, out: DataFrame, field: str, op: str, value: str, neg: bool) -> DataFrame:
        """lto_*/lby_* semi-joins (se/search.py:170-182): lto matches the
        target doc's url OR the extern_url; *_txt matches link text.
        Exclusion flips the semi-join to anti — same shuffle shape."""
        if self.links is None:
            raise ValueError("links table not configured")
        side, rel = field.split("_")
        key = "src_url" if side == "lto" else "dst_url"
        if rel == "url":
            other = "dst_url" if side == "lto" else "src_url"
            pred = filter_predicate(F.col(other), op, value) | filter_predicate(
                F.coalesce(F.col("extern_url"), F.lit("")), op, value
            )
        else:
            pred = filter_predicate(F.col("text"), op, value)
        matching = self.links.filter(pred).select(F.col(key).alias("url"))
        return out.join(matching, "url", "left_anti" if neg else "left_semi")

    def _tag_filter(self, out: DataFrame, op: str, value: str, neg: bool) -> DataFrame:
        """tag filter expands to the whole subtree (se/search.py:183-189)."""
        if self.tags is None or self.doc_tags is None:
            raise ValueError("tags tables not configured")
        matched = self.tags.filter(filter_predicate(F.col("name"), op, value)).select(
            F.col("path").alias("m_path")
        )
        subtree = (
            self.tags.join(
                F.broadcast(matched),
                (F.col("path") == F.col("m_path"))
                | F.col("path").startswith(F.concat(F.col("m_path"), F.lit("/"))),
                "left_semi",
            )
            .select("tag_id")
        )
        tagged = (
            self.doc_tags.join(F.broadcast(subtree), "tag_id", "left_semi")
            .select("url")
            .distinct()
        )
        return out.join(tagged, "url", "left_anti" if neg else "left_semi")

    # -- /api/document/ ----------------------------------------------------

    def document(self, url: str) -> DataFrame:
        """GET /api/document/?url=… (se/rest_api.py 'document' router)."""
        return self.docs.filter(F.col("url") == url)

    # -- stats endpoints ----------------------------------------------------

    def lang_stats(self) -> DataFrame:
        """GET /api/lang_stats/ (se/rest_api.py:131-148)."""
        return lang_stats(self.docs)

    def mime_stats(self) -> DataFrame:
        """GET /api/mime_stats/ (se/rest_api.py:165-195)."""
        return mime_stats(self.docs, mime_col="mimetype")

    def tag_stats(self) -> DataFrame:
        """GET /api/tag/ rollup counts (se/tag.py:52-82)."""
        if self.tags is None or self.doc_tags is None:
            raise ValueError("tags tables not configured")
        return tag_rollup(self.tags, self.doc_tags)

    def stats(self) -> DataFrame:
        """GET /api/stats/ time series — the metrics table, newest first
        (se/rest_api.py:60-64; CrawlerStats se/models.py:189-228)."""
        if self.metrics is None:
            raise ValueError("metrics table not configured")
        return self.metrics.orderBy(F.col("round_no").desc())

    # -- /api/queue/ ---------------------------------------------------------

    def queue(self, engine, urls: list[str], t, manual: bool = True) -> None:
        """POST /api/queue/ → queue_urls (se/rest_api.py:606-634,
        se/add_to_queue.py:59-89) — delegates to the crawl engine's seed
        upsert (F31/F32).  ``t`` is the engine's injected logical clock
        (crawl_loop.py seed) — the API stays wall-clock-free too."""
        engine.seed(urls, t, manual=manual)


# ---------------------------------------------------------------------------
# Search history (SearchHistory, se/models.py:443-497 + se/history.py:30-66)
# ---------------------------------------------------------------------------

_HISTORY_SCHEMA = (
    "hist_id long, user string, query string, querystring string, "
    "tags array<string>, date timestamp"
)
_FILTER_RE = r"(ft|ff|fo|fv|fc)[0-9]+$"  # se/search.py:41


def save_history(
    spark: SparkSession,
    history: DataFrame | None,
    user: str,
    get_params: dict[str, str],
    tags: list[str],
    t,
) -> DataFrame | None:
    """SearchHistory.save_history (se/models.py:450-497): keep the
    filter/lang/sort/query params (sorted by key), space-join the fv
    values into the display query, dedup against the user's LAST entry
    (same querystring + tags ⇒ no-op), skip empty searches.  Returns the
    new history DataFrame (caller persists), or the input when nothing
    was recorded."""
    import re as _re
    from urllib.parse import urlencode

    q = get_params.get("q", "")
    tags = sorted(tags or [])
    params = {}
    queryparams = ""
    for key in sorted(get_params):
        if not _re.match(_FILTER_RE, key) and key not in ("doc_lang", "s", "q"):
            continue
        params[key] = get_params[key]
        if key.startswith("fv"):
            queryparams += (" " if queryparams else "") + get_params[key]
    if q and queryparams:
        q = f"{q} ({queryparams})"
    qs = urlencode(params)

    if not q and not queryparams and not tags:
        return history
    if not q:
        q = queryparams

    next_id = 0
    if history is not None:
        # ONE aggregation job: global max id + the user's latest entry
        # (max_by over (is_mine, date, id) — a mine row, if any exists,
        # always outranks others; the user check below rejects the
        # fallback winner when the user has no rows)
        agg = history.agg(
            F.max("hist_id").alias("top"),
            F.max_by(
                F.struct("user", "querystring", "tags"),
                F.struct((F.col("user") == user).alias("m"), "date", "hist_id"),
            ).alias("last"),
        ).collect()[0]
        last = agg["last"]
        if (
            last is not None
            and last["user"] == user
            and last["querystring"] == qs
            and sorted(last["tags"] or []) == tags
        ):
            return history  # consecutive-duplicate dedup
        next_id = (agg["top"] if agg["top"] is not None else -1) + 1

    row = spark.createDataFrame(
        [(next_id, user, q, qs, tags, t)], _HISTORY_SCHEMA
    )
    return row if history is None else history.unionByName(row)


def history_page(history: DataFrame, user: str, page: int = 1, page_size: int = 20) -> DataFrame:
    """HistoryView list: the user's entries newest-first, paginated
    (se/history.py:34-41)."""
    out = history.filter(F.col("user") == user).orderBy(
        F.col("date").desc(), F.col("hist_id").desc()
    )
    return out.offset((page - 1) * page_size).limit(page_size)


def history_delete(history: DataFrame, user: str, ids: list[int] | None = None) -> DataFrame:
    """HistoryView.post (se/history.py:56-66): del_all (ids=None) or
    per-id deletes — only the requesting user's rows."""
    mine = F.col("user") == user
    if ids is None:
        return history.filter(~mine)
    return history.filter(~(mine & F.col("hist_id").isin([int(i) for i in ids])))


# ---------------------------------------------------------------------------
# Admin import / descriptor shims
# ---------------------------------------------------------------------------


def parse_excluded_urls(text: str) -> list[str]:
    """ExcludedUrlsImportView textarea parsing (se/excluded_urls_import.py
    :43-60): one URL per line, blanks stripped; raises when empty.  Feed
    the result to admit_links(excluded_exact=...) or, with the form's
    starting_with flag, excluded_prefix (F10)."""
    urls = [line.strip() for line in text.split("\n") if line.strip()]
    if not urls:
        raise ValueError("At least one URL must be provided")
    return urls


def opensearch_descriptor(base_url: str, short_name: str = "Sosse") -> str:
    """The OpenSearch 1.1 descriptor XML (se/opensearch.py +
    se/templates/se/opensearch.xml) — lets browsers register the engine;
    `base_url` ≙ request.build_absolute_uri('/') sans trailing slash.
    Values are XML-escaped (the reference renders through Django's
    autoescaping template)."""
    from xml.sax.saxutils import escape

    base = base_url.rstrip("/")
    name = escape(short_name)
    attr = escape(f"{base}/?q=", {'"': "&quot;"})
    template = f'"{attr}{{searchTerms}}"'
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<OpenSearchDescription xmlns="http://a9.com/-/spec/opensearch/1.1/"\n'
        '                       xmlns:moz="http://www.mozilla.org/2006/browser/search/">\n'
        f"  <ShortName>{name}</ShortName>\n"
        f"  <Description>{name} search engine</Description>\n"
        "  <InputEncoding>UTF-8</InputEncoding>\n"
        f'  <Url type="text/html" method="GET" template={template}/>\n'
        "</OpenSearchDescription>"
    )


# ---------------------------------------------------------------------------
# HDD stats (HddStatsViewSet, se/rest_api.py:75-101)
# ---------------------------------------------------------------------------


def hdd_stats(root: str) -> dict:
    """GET /api/hdd_stats/ — disk usage over an engine root.

    Reference shape (se/rest_api.py:67-101): {db, screenshots, html,
    other, free}.  Mapping for this engine: `db` ≙ all snapshot/append
    tables except the payload table; `html` ≙ the documents table (the
    stored payloads — the reference's HTML-dump dir analog);
    `screenshots` is 0 (browser capture not ported, SURVEY §7.4).
    A per-table breakdown rides along under "tables" — it is what
    `CrawlEngine.vacuum` shrinks."""
    import os

    def dir_size(d: str) -> int:
        total = 0
        for dirpath, _dirs, files in os.walk(d):
            for fname in files:
                fp = os.path.join(dirpath, fname)
                if not os.path.islink(fp):
                    try:
                        total += os.path.getsize(fp)
                    except OSError:
                        pass
        return total

    tables: dict[str, int] = {}
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            p = os.path.join(root, name)
            if os.path.isdir(p):
                tables[name] = dir_size(p)
    st = os.statvfs(root if os.path.isdir(root) else "/")
    size = st.f_frsize * st.f_blocks
    free = st.f_frsize * st.f_bavail
    payload = tables.get("documents", 0)
    db = sum(tables.values()) - payload
    return {
        "db": db,
        "screenshots": 0,
        "html": payload,
        "other": max(size - free - db - payload, 0),
        "free": free,
        "tables": tables,
    }


# ---------------------------------------------------------------------------
# Online status + search redirect (se/online.py:29-70, se/search_redirect.py)
# ---------------------------------------------------------------------------


class OnlineStatus:
    """online_status (se/online.py:29-61): the search page's
    online/offline pill.  The form's `o` param forces the verdict
    ('o' → online, 'l' → offline); otherwise a connectivity probe runs,
    its verdict cached for `check_cache` requests (None ⇒ probe once,
    cache forever — the reference's SOSSE_ONLINE_CHECK_CACHE=None arm).
    `probe` is injected (this engine performs no real network I/O):
    any zero-arg callable that raises on connectivity failure."""

    def __init__(self, enabled: bool = True, check_cache: int | None = 10, probe=None):
        self.enabled = enabled
        self.check_cache = check_cache
        self.probe = probe
        self._count = 0
        self._value: str | None = None

    def status(self, o_param: str | None = None) -> str:
        if not self.enabled:
            return ""
        if o_param == "o":
            return "online"
        if o_param == "l":
            return "offline"
        if self.check_cache is None and self._value:
            return self._value
        if self._count != 0:
            self._count -= 1
            if self._value:
                return self._value
        self._count = self.check_cache or 0
        try:
            if self.probe is not None:
                self.probe()
            self._value = "online"
        except Exception:
            self._value = "offline"
        return self._value

    def check(self) -> dict:
        """GET /online_check (OnlineCheckView, se/online.py:64-70):
        uncached probe with a status payload."""
        try:
            if self.probe is not None:
                self.probe()
        except Exception as e:  # the reference reports the exception doc
            return {"status": type(e).__doc__ or str(e), "success": False}
        return {"status": "Success", "success": True}


def search_redirect_context(base_url: str, q: str | None) -> dict:
    """SearchRedirectView context (se/search_redirect.py:25-33): the
    offline-fallback page that forwards the query to an external engine
    — `url` is the instance base, `q` the quote_plus-encoded query."""
    from urllib.parse import quote_plus

    return {"url": base_url.rstrip("/") + "/", "q": quote_plus(q or "")}


# ---------------------------------------------------------------------------
# Archive / download serving (se/archive.py:34-230, se/download.py:28-56 —
# reduced to the engine tier: no template rendering, the payload row IS
# the archive)
# ---------------------------------------------------------------------------


def archive_latest(documents: DataFrame, url: str) -> DataFrame:
    """The newest stored payload row for a URL plus the download
    metadata the reference's DownloadView computes (filename rebuilt
    from the URL tail with the payload's format as extension, filesize
    from the stored bytes; the reference picks the newest asset via
    order_by(download_date).last() — here the highest round wins).

    One-row result; the filter pushes straight onto the documents scan.
    """
    from urllib.parse import unquote

    from pyspark.sql import Window

    tail = unquote(url.rstrip("/").rsplit("/", 1)[-1]) or "index"
    if "." in tail:
        tail = tail.rsplit(".", 1)[0]

    w = Window.partitionBy("url").orderBy(F.col("round_no").desc())
    latest = (
        documents.filter(F.col("url") == url)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.select(
        "url",
        "fmt",
        "bytes",
        "caption",
        *(["title"] if "title" in documents.columns else []),
        "round_no",
        F.concat(F.lit(tail + "."), F.coalesce(F.col("fmt"), F.lit("bin"))).alias(
            "filename"
        ),
        F.length("bytes").alias("filesize"),
    )


# ---------------------------------------------------------------------------
# /api/webhook router parity (WebhookViewSet, se/rest_api.py:470-537)
# ---------------------------------------------------------------------------


def example_doc() -> dict:
    """The fixture document the test_trigger endpoint renders templates
    against (se/document.py:53-60)."""
    return {
        "url": "https://example.com/",
        "title": "Example Title",
        "mimetype": "text/html",
        "lang_iso_639_1": "en",
        "content": "Example",
    }


def webhook_list(configs) -> list[dict]:
    """WebhookSerializer list (se/rest_api.py:470-474, fields="__all__"):
    the full config of every webhook as plain dicts, name-ordered like
    the admin listing."""
    from dataclasses import asdict

    return [asdict(c) for c in sorted(configs, key=lambda c: c.name)]


def webhook_test_trigger(config, transport=None) -> dict:
    """POST /api/webhook/test_trigger (se/rest_api.py:487-505): send the
    candidate config against the example document and return the raw
    outcome dict — the reference's 4-key taxonomy on delivery, or
    {"error": ...} (HTTP 400 arm) when the config itself is invalid
    (unparseable body template -> ValueError, se/rest_api.py:495-499).

    Driver-side single POST by design — the endpoint exists to let an
    admin validate a config BEFORE attaching it to a collection; bulk
    delivery stays in operators/webhooks.deliver_webhooks."""
    import base64

    from sosse_spark.operators.webhooks import _urllib_transport, render_body

    tp = transport or _urllib_transport
    try:
        body = render_body(example_doc(), config.body_template)
    except ValueError as e:
        return {"error": str(e)}
    headers = {"Accept": "application/json", "Content-Type": "application/json"}
    headers.update(dict(config.headers))
    if config.username and config.password:
        cred = f"{config.username}:{config.password}".encode()
        headers["Authorization"] = "Basic " + base64.b64encode(cred).decode()
    try:
        status, reason, text = tp(
            config.method, config.url, headers, body, config.timeout
        )
        return {
            "status_code": status,
            "status_string": reason,
            "response": text,
            "error": None,
        }
    except Exception as e:
        return {"status_code": None, "status_string": None, "response": None, "error": str(e)}


def webhook_status_line(result: dict) -> tuple[bool, str]:
    """The status half of webhook_html_status (se/webhook.py:58-73)
    without the Django markup: (ok, "status\\nmessage") where ok mirrors
    the yes/no icon choice (2xx status)."""
    status_code = result.get("status_code")
    ok = isinstance(status_code, int) and 200 <= status_code < 300
    if result.get("status_code") is None or result.get("status_string") is None:
        status = "Error"
    else:
        status = f"{result.get('status_code')} {result.get('status_string')}"
    message = result.get("error") or result.get("response") or ""
    return ok, f"{status}\n{message}"


# ---------------------------------------------------------------------------
# /download/ view context (se/download.py:27-56) + mimetype icons
# ---------------------------------------------------------------------------

# Representative subset of the reference's unicode_mime_icons table
# (se/deps/unicode_mime_icons — a regex → glyph JSON the reference scans
# in order, se/utils.py:206-217).  The full table is a vendored dataset;
# the SEMANTICS ported here are first-match-in-order with the 🗎
# default.  Ordering matters: specific types precede family globs.
MIMETYPE_ICONS: tuple = (
    (r"^application/pdf", "📕"),
    (r"^application/(zip|gzip|x-tar|x-7z-compressed|x-rar)", "🗜"),
    (r"^application/(json|xml)", "🗒"),
    (r"^text/html", "🌐"),
    (r"^text/", "🗒"),
    (r"^image/", "🖼"),
    (r"^audio/", "🎵"),
    (r"^video/", "🎞"),
    (r"^font/", "🔤"),
)


def mimetype_icon(mime: str | None) -> str:
    """``mimetype_icon`` (se/utils.py:206-217): first regex in table
    order that matches the mimetype wins; anything else (including
    None) gets the generic document glyph."""
    import re as _re

    if mime:
        for regex, icon in MIMETYPE_ICONS:
            if _re.match(regex, mime):
                return icon
    return "🗎"


def download_context(
    url: str, asset_filename: str, asset_size: int, mimetype: str
) -> dict:
    """DownloadView.get_context_data (se/download.py:29-55): the
    download filename takes the LAST url path segment (trailing slash
    stripped, percent-unquoted), drops its extension, and adopts the
    stored asset's extension; plus size, icon and mime family for the
    template.  The caller resolves the newest HTMLAsset row for the url
    (``ORDER BY download_date DESC LIMIT 1`` over the assets table) and
    redirects to the archive view when none exists — the
    RedirectException arm (se/download.py:33-34)."""
    from urllib.parse import unquote

    filename = unquote(url.rstrip("/").rsplit("/", 1)[1])
    if "." in filename:
        filename = filename.rsplit(".", 1)[0]
    extension = asset_filename.rsplit(".", 1)[1]
    return {
        "filename": f"{filename}.{extension}",
        "filesize": asset_size,
        "icon": mimetype_icon(mimetype),
        "mimebase": mimetype.split("/", 1)[0],
    }
