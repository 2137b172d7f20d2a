"""Preview metadata + thumbnail planning (P9 — se/document_meta.py).

``DocumentMeta`` parity, Spark-first:

  * ``preview_meta`` resolves the preview ``image`` / ``description``
    through the linkpreview model chain the reference imports
    (se/document_meta.py:21 ``from linkpreview import Link,
    LinkPreview``): OpenGraph ``<meta property="og:*">`` → TwitterCard
    ``<meta name="twitter:*">`` → Microdata ``<meta itemprop=...>`` →
    JSON-LD ``<script type="application/ld+json">`` → Generic.  Each
    property is resolved independently; the first model that yields a
    non-empty value wins.  The four structured models are exact; the
    Generic tail is a DECLARED approximation (image = first ``<img
    src>``, description = ``<meta name="description">`` else the first
    ``<p>``'s text).  Raw content values ride as candidates —
    linkpreview's internal relative-image resolution is not replicated
    because the reference re-absolutizes every candidate against the
    document URL anyway (se/document_meta.py:103).
  * ``preview_urls`` is ``DocumentMeta.get_preview_urls``
    (se/document_meta.py:32-47) verbatim: the resolved image first,
    then the space-split quirk — an image/description value that starts
    with ``http:``/``https:``/``:/``/``/`` and contains a space
    contributes its first space-delimited token as an extra candidate.
  * ``select_preview`` is the ``create_preview`` loop
    (se/document_meta.py:98-106) + the non-network half of
    ``preview_file_from_url`` (:50-70): ``blob:`` skipped, candidates
    absolutized against the DOC url, ``data:`` URIs validated
    (``image/*`` payload + ``;base64`` marker, with the reference's
    ``lstrip("data:")`` char-set quirk) and base64-decoded inline.
    http(s) candidates become fetch-plan rows for the fetch stage; the
    FULL ordered viable list rides along so an HTTP miss can fall
    through to the next candidate at fetch time, which is where the
    reference's sequential try-loop lands in a batch engine.  Declared
    deltas: a candidate the URL parser rejects and a data: payload that
    fails base64 are skipped here (the reference would raise out of the
    index pass); non-http(s)/data schemes are skipped (BrowserRequest
    would error them into the next iteration).
  * ``thumb_size_cols`` is Pillow's ``Image.thumbnail`` geometry — the
    160×100 JPEG every preview lands in (se/document_meta.py:81-91,
    ``img.thumbnail((160, 100))``) — as pure-JVM integer column
    algebra: aspect-preserving fit, round-to-closest-aspect with
    floor-on-tie (Pillow's ``round_aspect``), minimum 1, never upscale.
  * ``thumbnail_plan`` is the Document.index disposition
    (se/document.py:466-487): text/* + preview modes → metadata
    preview (screenshot fallback flagged under ``prevscreen`` — browser
    capture is out of scope, SURVEY §7.4); image/* + any active mode →
    thumbnail the document itself (se/document.py:486); targets land at
    ``md5(url)[:2]/md5(url)`` (Document.image_name,
    se/document.py:222-227).

Scale shape: extraction is the same narrow mapInPandas stage class as
the P2 walk — no shuffle, no state, pipelines with fetch; disposition
and thumbnail geometry are pure column algebra inside whole-stage
codegen (no UDF).
"""

from __future__ import annotations

import json
from base64 import b64decode
from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame, functions as F

from sosse_spark.functions.urlnorm import absolutize_url
from sosse_spark.operators.htmlparse import (
    _build_tree,
    _elem_text,
    _find_all,
    _find_first,
    _Node,
)

__all__ = [
    "preview_meta",
    "preview_urls",
    "select_preview",
    "preview_batch",
    "PREVIEW_SCHEMA",
    "thumb_size_cols",
    "thumbnail_plan",
    "image_name_col",
]

# linkpreview model chain (se/document_meta.py:35 LinkPreview(...)):
# per-property, first non-empty value in this order wins.
_META_MODELS = (
    ("property", "og:{}"),  # OpenGraph
    ("name", "twitter:{}"),  # TwitterCard
    ("itemprop", "{}"),  # Microdata
)


def _meta_lookup(metas: list, attr: str, value: str) -> Optional[str]:
    for node in metas:
        if node.attrs.get(attr) == value:
            content = node.attrs.get("content")
            if content:
                return content
    return None


def _jsonld_lookup(root: _Node, prop: str) -> Optional[str]:
    """JSON-LD model: first ``application/ld+json`` script whose
    top-level object carries the property.  ``image`` may be a string,
    a list (first element), or an object with ``url``; ``@graph``
    nesting is a declared non-goal."""
    for script in _find_all(root, "script", []):
        if (script.attrs.get("type") or "").strip().lower() != "application/ld+json":
            continue
        raw = "".join(c for c in script.children if isinstance(c, str))
        try:
            data = json.loads(raw)
        except ValueError:
            continue
        if not isinstance(data, dict):
            continue
        val = data.get(prop)
        if isinstance(val, list) and val:
            val = val[0]
        if isinstance(val, dict):
            val = val.get("url")
        if isinstance(val, str) and val:
            return val
    return None


def preview_meta(root: _Node) -> dict:
    """Resolve ``image`` / ``description`` through the model chain."""
    metas = _find_all(root, "meta", [])
    out = {}
    for prop in ("image", "description"):
        val = None
        for attr, pattern in _META_MODELS:
            val = _meta_lookup(metas, attr, pattern.format(prop))
            if val:
                break
        if not val:
            val = _jsonld_lookup(root, prop)
        if not val:  # Generic tail (declared approximation)
            if prop == "image":
                img = _find_first(root, "img")
                if img is not None:
                    val = img.attrs.get("src") or None
            else:
                val = _meta_lookup(metas, "name", "description")
                if not val:
                    p = _find_first(root, "p")
                    if p is not None:
                        val = _elem_text(p, recurse=True) or None
        out[prop] = val or None
    return out


_URLISH_PREFIXES = ("http:", "https:", ":/", "/")  # se/document_meta.py:46


def preview_urls(root: _Node, meta: Optional[dict] = None) -> list:
    """``DocumentMeta.get_preview_urls`` (se/document_meta.py:32-47):
    the resolved image, then the first space-split token of any
    URL-ish image/description value containing a space.  ``meta`` may
    carry an already-resolved preview_meta() to avoid a second scan."""
    if meta is None:
        meta = preview_meta(root)
    out = []
    if meta["image"]:
        out.append(meta["image"])
    for attr in ("image", "description"):
        url = meta[attr]
        if url is None:
            continue
        if url.startswith(_URLISH_PREFIXES) and " " in url:
            out.append(url.split(" ", 1)[0])
    return out


def _classify_data_uri(absu: str):
    """The data: arm of preview_file_from_url (se/document_meta.py:55-64),
    including the ``lstrip("data:")`` CHAR-SET strip quirk."""
    rest = absu.lstrip("data:")
    if not rest.startswith("image/"):
        return None
    if "," not in rest:
        return None
    mimetype, payload = rest.split(",", 1)
    if not mimetype.endswith(";base64"):
        return None
    try:
        blob = b64decode(payload)
    except Exception:
        return None  # bad padding: the reference raises out of the pass
    # non-strict b64decode discards invalid chars; an empty decode is a
    # payload PIL could never open (UnidentifiedImageError → next
    # candidate in the reference loop), so classify it invalid here
    return blob or None


def select_preview(page_url: str, candidates: list) -> dict:
    """``create_preview``'s sequential try-loop (se/document_meta.py:
    98-106) minus the network: returns the first viable candidate
    (data: decoded inline) plus the full ordered viable list for
    fetch-time fall-through."""
    viable = []
    chosen = None
    kind = "none"
    inline = None
    for raw in candidates:
        if raw.startswith("blob:"):  # se/document_meta.py:100
            continue
        try:
            absu = absolutize_url(page_url, raw)  # se/document_meta.py:103
        except ValueError:
            continue
        if absu.startswith("data:"):
            blob = _classify_data_uri(absu)
            if blob is None:
                continue
            viable.append(absu)
            if chosen is None:
                chosen, kind, inline = absu, "data", blob
        elif absu.startswith(("http:", "https:")):
            viable.append(absu)
            if chosen is None:
                chosen, kind = absu, "http"
    return {"chosen_url": chosen, "chosen_kind": kind, "inline": inline, "viable": viable}


PREVIEW_SCHEMA = (
    "url string, preview_image string, preview_description string, "
    "candidates array<string>, chosen_url string, chosen_kind string, "
    "inline_len long, viable array<string>"
)


def preview_batch(
    pages: DataFrame, url_col: str = "url", content_col: str = "content"
) -> DataFrame:
    """mapInPandas preview stage: (url, content) → PREVIEW_SCHEMA.
    Arrow-batched; the kernel never sees the driver."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for url, content in zip(pdf[url_col], pdf[content_col]):
                html = content
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                root = _build_tree(html)
                meta = preview_meta(root)
                cands = preview_urls(root)
                sel = select_preview(url, cands)
                rows.append(
                    {
                        "url": url,
                        "preview_image": meta["image"],
                        "preview_description": meta["description"],
                        "candidates": cands,
                        "chosen_url": sel["chosen_url"],
                        "chosen_kind": sel["chosen_kind"],
                        "inline_len": len(sel["inline"]) if sel["inline"] is not None else None,
                        "viable": sel["viable"],
                    }
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "preview_image",
                    "preview_description",
                    "candidates",
                    "chosen_url",
                    "chosen_kind",
                    "inline_len",
                    "viable",
                ],
                dtype=object,
            )
            # nullable int64 rule (CLAUDE.md): object → Int64, never float64
            out["inline_len"] = out["inline_len"].astype("Int64")
            yield out

    from sosse_spark.partitioning import fanout

    return fanout(pages.select(url_col, content_col)).mapInPandas(run, PREVIEW_SCHEMA)


def thumb_size_cols(
    width: Column, height: Column, box_w: int = 160, box_h: int = 100
):
    """Pillow ``Image.thumbnail((box_w, box_h))`` geometry as column
    algebra (the preview thumbnail size, se/document_meta.py:86-91):
    never upscale (box ≥ image in BOTH axes → unchanged); otherwise pin
    the binding axis to the box and choose the other between
    floor/ceil of the aspect-exact value by Pillow's ``round_aspect``
    key (|aspect − n/y| on the wide-box branch, the harmonic
    |aspect − box_w/n| with a 0-guard on the tall branch), ties to
    floor, minimum 1.

    The keys are computed in IEEE-754 DOUBLES exactly as CPython does —
    Pillow's tie behavior on exact-aspect hits is decided by float
    rounding, so an integer cross-multiplied formulation diverges on
    ties (measured: 119 tie divergences on a 600×400 grid).  Spark,
    DuckDB, and CPython share IEEE double semantics, so this matches
    Pillow bit-for-bit (differential-tested over 440k shapes) AND lets
    the DuckDB oracle recompute it."""
    w = width.cast("long")
    h = height.cast("long")
    W = F.lit(int(box_w)).cast("long")
    H = F.lit(int(box_h)).cast("long")
    one = F.lit(1).cast("long")

    noop = (W >= w) & (H >= h)
    aspect = w / h  # double, as Pillow computes it
    wide_box = (W / H) >= aspect

    # branch 1: y = box_h, x = round_aspect(H*aspect, key=|aspect − n/H|)
    v1 = H * aspect
    fl1 = F.floor(v1)
    cl1 = F.ceil(v1)
    x1 = F.when(F.abs(aspect - fl1 / H) <= F.abs(aspect - cl1 / H), fl1).otherwise(cl1)
    x1 = F.greatest(x1, one)

    # branch 2: x = box_w, y = round_aspect(W/aspect, harmonic key with 0-guard)
    v2 = W / aspect
    fl2 = F.floor(v2)
    cl2 = F.ceil(v2)
    kf = F.when(fl2 == 0, F.lit(0.0)).otherwise(F.abs(aspect - W / fl2))
    kc = F.when(cl2 == 0, F.lit(0.0)).otherwise(F.abs(aspect - W / cl2))
    y2 = F.greatest(F.when(kf <= kc, fl2).otherwise(cl2), one)

    tw = F.when(noop, w).when(wide_box, x1).otherwise(W).cast("long")
    th = F.when(noop, h).when(wide_box, H).otherwise(y2).cast("long")
    return tw, th


def image_name_col(url: Column) -> Column:
    """``Document.image_name`` (se/document.py:222-227):
    ``md5(url)[:2]/md5(url)`` — the thumbnail's target path stem."""
    digest = F.md5(url.cast("binary"))
    return F.concat(F.substring(digest, 1, 2), F.lit("/"), digest)


# Collection thumbnail modes (se/collection.py:98-101)
THUMBNAIL_MODE_PREVIEW = "preview"
THUMBNAIL_MODE_PREV_OR_SCREEN = "prevscreen"
THUMBNAIL_MODE_SCREENSHOT = "screenshot"
THUMBNAIL_MODE_NONE = "none"

_PREVIEW_MODES = (THUMBNAIL_MODE_PREVIEW, THUMBNAIL_MODE_PREV_OR_SCREEN)
_SCREEN_MODES = (THUMBNAIL_MODE_PREV_OR_SCREEN, THUMBNAIL_MODE_SCREENSHOT)
_IMG_MODES = _PREVIEW_MODES + (THUMBNAIL_MODE_SCREENSHOT,)


def thumbnail_plan(
    docs: DataFrame,
    thumbnail_mode: str = THUMBNAIL_MODE_PREV_OR_SCREEN,
    mimetype_col: str = "mimetype",
    url_col: str = "url",
) -> DataFrame:
    """Document.index's thumbnail disposition (se/document.py:466-487)
    as column algebra: ``disposition`` names the primary path,
    ``screenshot_fallback`` flags the prevscreen retry arm (taken when
    the preview yields nothing — a fetch-time outcome), ``image_name``
    is the target path stem."""
    is_text = F.col(mimetype_col).startswith("text/")
    is_img = F.col(mimetype_col).startswith("image/")
    disposition = (
        F.when(is_text & F.lit(thumbnail_mode in _PREVIEW_MODES), F.lit("preview_meta"))
        .when(
            is_text & F.lit(thumbnail_mode == THUMBNAIL_MODE_SCREENSHOT),
            F.lit("screenshot"),
        )
        .when(is_img & F.lit(thumbnail_mode in _IMG_MODES), F.lit("self_image"))
        .otherwise(F.lit("none"))
    )
    fallback = is_text & F.lit(thumbnail_mode == THUMBNAIL_MODE_PREV_OR_SCREEN)
    return docs.withColumn("disposition", disposition).withColumn(
        "screenshot_fallback", fallback
    ).withColumn("image_name", image_name_col(F.col(url_col)))
