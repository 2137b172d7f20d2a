"""Preview metadata + thumbnail planning (se/document_meta.py parity).

Covers the linkpreview model chain priority, the get_preview_urls
space-split quirk (se/document_meta.py:41-47), the create_preview
candidate loop (blob skip / data-URI validation / absolutization
against the DOC url), Pillow thumbnail geometry (differential vs a
pure-Python replica of the Pillow source algorithm), and the
Document.index thumbnail disposition (se/document.py:466-487)."""

import math

from pyspark.sql import functions as F

from sosse_spark.operators.htmlparse import _build_tree
from sosse_spark.operators.preview import (
    preview_batch,
    preview_meta,
    preview_urls,
    select_preview,
    thumb_size_cols,
    thumbnail_plan,
)


def _meta(html):
    return preview_meta(_build_tree(html))


# --- model chain priority (linkpreview order: og → twitter →
# microdata → json-ld → generic) ---

_ALL_MODELS = """
<html><head>
<meta property="og:image" content="http://x/og.png">
<meta name="twitter:image" content="http://x/tw.png">
<meta itemprop="image" content="http://x/md.png">
<script type="application/ld+json">{"image": "http://x/ld.png"}</script>
</head><body><img src="http://x/img.png"><p>para text</p></body></html>
"""


def test_model_priority_image():
    assert _meta(_ALL_MODELS)["image"] == "http://x/og.png"
    no_og = _ALL_MODELS.replace('property="og:image"', 'property="nope"')
    assert _meta(no_og)["image"] == "http://x/tw.png"
    no_tw = no_og.replace('name="twitter:image"', 'name="nope"')
    assert _meta(no_tw)["image"] == "http://x/md.png"
    no_md = no_tw.replace('itemprop="image"', 'itemprop="nope"')
    assert _meta(no_md)["image"] == "http://x/ld.png"
    no_ld = no_md.replace("application/ld+json", "text/plain")
    assert _meta(no_ld)["image"] == "http://x/img.png"  # generic first <img>


def test_model_priority_description():
    html = """
    <meta property="og:description" content="og d">
    <meta name="twitter:description" content="tw d">
    <meta name="description" content="generic d">
    <p>first para</p>
    """
    assert _meta(html)["description"] == "og d"
    assert _meta(html.replace("og:description", "nope"))["description"] == "tw d"
    bare = '<meta name="description" content="generic d"><p>first para</p>'
    assert _meta(bare)["description"] == "generic d"
    assert _meta("<p>first para</p>")["description"] == "first para"


def test_jsonld_shapes():
    for payload, want in [
        ('{"image": ["http://x/a.png", "http://x/b.png"]}', "http://x/a.png"),
        ('{"image": {"url": "http://x/o.png"}}', "http://x/o.png"),
        ('{"image": 42}', None),
        ("not json", None),
        ('["top-level list"]', None),
    ]:
        html = f'<script type="application/ld+json">{payload}</script>'
        assert _meta(html)["image"] == want, payload


def test_empty_content_is_missing():
    # linkpreview checks truthiness: empty og:image falls through
    html = '<meta property="og:image" content=""><meta name="twitter:image" content="http://x/t.png">'
    assert _meta(html)["image"] == "http://x/t.png"


# --- get_preview_urls quirk (se/document_meta.py:32-47) ---


def test_preview_urls_image_first_then_space_tokens():
    html = """
    <meta property="og:image" content="http://x/a.png 2x">
    <meta property="og:description" content="http://x/d.jpg caption">
    """
    urls = preview_urls(_build_tree(html))
    # image yielded in full, then image first-token, then description first-token
    assert urls == ["http://x/a.png 2x", "http://x/a.png", "http://x/d.jpg"]


def test_preview_urls_non_urlish_description_not_yielded():
    html = '<meta property="og:description" content="plain words here">'
    assert preview_urls(_build_tree(html)) == []
    # url-ish prefix without a space: no token candidate either
    html2 = '<meta property="og:description" content="http://x/solo.png">'
    assert preview_urls(_build_tree(html2)) == []


def test_preview_urls_relative_image():
    html = '<meta property="og:image" content="/rel/img.png">'
    assert preview_urls(_build_tree(html)) == ["/rel/img.png"]


# --- create_preview loop (se/document_meta.py:98-106 + :50-70) ---

PAGE = "http://h.example.com/p/1"


def test_select_blob_skipped_http_chosen():
    sel = select_preview(PAGE, ["blob:http://x/y", "http://x/a.png"])
    assert sel["chosen_url"] == "http://x/a.png"
    assert sel["chosen_kind"] == "http"
    assert sel["viable"] == ["http://x/a.png"]


def test_select_relative_absolutized_against_doc_url():
    sel = select_preview(PAGE, ["/rel/i.png"])
    assert sel["chosen_url"] == "http://h.example.com/rel/i.png"
    assert sel["chosen_kind"] == "http"


def test_select_data_uri_decoded():
    import base64

    blob = b"PNGFAKEBYTES"
    uri = "data:image/png;base64," + base64.b64encode(blob).decode()
    sel = select_preview(PAGE, [uri])
    assert sel["chosen_kind"] == "data"
    assert sel["inline"] == blob
    assert sel["chosen_url"] == uri


def test_select_data_uri_validation_arms():
    # non-image payload → skipped (se/document_meta.py:57)
    assert select_preview(PAGE, ["data:text/plain;base64,QUJD"])["chosen_kind"] == "none"
    # not base64-marked → skipped (:61)
    assert select_preview(PAGE, ["data:image/png,rawbytes"])["chosen_kind"] == "none"
    # all-invalid base64 decodes to b"" non-strictly → PIL would raise
    # UnidentifiedImageError in the reference → next candidate
    assert select_preview(PAGE, ["data:image/png;base64,@@@@!"])["chosen_kind"] == "none"
    # invalid falls through to the NEXT candidate (fetch-time loop shape)
    sel = select_preview(PAGE, ["data:text/plain;base64,QUJD", "http://x/n.png"])
    assert sel["chosen_url"] == "http://x/n.png"


def test_select_non_http_scheme_skipped():
    sel = select_preview(PAGE, ["ftp://x/y.png", "http://x/ok.png"])
    assert sel["chosen_url"] == "http://x/ok.png"
    assert sel["viable"] == ["http://x/ok.png"]


def test_select_space_candidate_percent_encoded():
    sel = select_preview(PAGE, ["http://x/a.png 2x", "http://x/a.png"])
    assert sel["chosen_url"] == "http://x/a.png%202x"
    assert sel["viable"] == ["http://x/a.png%202x", "http://x/a.png"]


# --- Pillow thumbnail geometry ---


def _pillow_thumbnail(w, h, W=160, H=100):
    """Pure-Python replica of Pillow's Image.thumbnail geometry
    (Pillow 9+ source: round_aspect with float keys, min 1, never
    upscale) — the behavior the engine column algebra must match."""

    def round_aspect(number, key):
        return max(min(math.floor(number), math.ceil(number), key=key), 1)

    x, y = W, H
    if x >= w and y >= h:
        return (w, h)
    aspect = w / h
    if x / y >= aspect:
        x = round_aspect(y * aspect, key=lambda n: abs(aspect - n / y))
    else:
        y = round_aspect(x / aspect, key=lambda n: 0 if n == 0 else abs(aspect - x / n))
    return (x, y)


def test_thumb_geometry_differential(spark):
    # grid includes the float-tie shapes (3,120)-style that break an
    # integer-rounding formulation, plus extremes in both directions
    shapes = [(w, h) for w in range(1, 50) for h in range(1, 50)]
    shapes += [(3, 120), (4, 160), (7, 200), (320, 200), (1000, 100), (100, 1000),
               (160, 100), (160, 101), (161, 100), (100000, 1), (1, 100000),
               (159, 99), (8, 5), (16, 10), (480, 300), (481, 300)]
    df = spark.createDataFrame(shapes, "w int, h int")
    tw, th = thumb_size_cols(F.col("w"), F.col("h"))
    rows = df.select("w", "h", tw.alias("tw"), th.alias("th")).collect()
    for r in rows:
        assert (r.tw, r.th) == _pillow_thumbnail(r.w, r.h), (r.w, r.h)


def test_thumb_geometry_custom_box(spark):
    df = spark.createDataFrame([(300, 500), (50, 20), (7, 7)], "w int, h int")
    tw, th = thumb_size_cols(F.col("w"), F.col("h"), box_w=64, box_h=64)
    rows = {(r.w, r.h): (r.tw, r.th) for r in df.select("w", "h", tw.alias("tw"), th.alias("th")).collect()}
    for (w, h), got in rows.items():
        assert got == _pillow_thumbnail(w, h, 64, 64), (w, h)


# --- end-to-end batch kernel ---


def test_preview_batch_spark(spark):
    import base64

    blob_b64 = base64.b64encode(b"IMGDATA").decode()
    pages = spark.createDataFrame(
        [
            ("http://a.example.com/1",
             '<meta property="og:image" content="/i/a.png">'
             '<meta property="og:description" content="hello world">'),
            ("http://b.example.com/2",
             f'<meta name="twitter:image" content="data:image/png;base64,{blob_b64}">'),
            ("http://c.example.com/3", "<p>no preview here</p>"),
        ],
        "url string, content string",
    )
    out = {r.url: r for r in preview_batch(pages).collect()}
    a = out["http://a.example.com/1"]
    assert a.preview_image == "/i/a.png"
    assert a.preview_description == "hello world"
    assert a.candidates == ["/i/a.png"]
    assert a.chosen_url == "http://a.example.com/i/a.png"
    assert a.chosen_kind == "http"
    assert a.inline_len is None
    b = out["http://b.example.com/2"]
    assert b.chosen_kind == "data"
    assert b.inline_len == len(b"IMGDATA")
    c = out["http://c.example.com/3"]
    assert c.chosen_kind == "none"
    assert c.candidates == []
    # description generic tail picked the <p>
    assert c.preview_description == "no preview here"


# --- Document.index disposition (se/document.py:466-487) ---


def test_thumbnail_plan_dispositions(spark):
    docs = spark.createDataFrame(
        [("http://x/t", "text/html"), ("http://x/i", "image/png"),
         ("http://x/o", "application/pdf")],
        "url string, mimetype string",
    )

    def plan(mode):
        return {
            r.url: (r.disposition, r.screenshot_fallback)
            for r in thumbnail_plan(docs, thumbnail_mode=mode).collect()
        }

    p = plan("preview")
    assert p["http://x/t"] == ("preview_meta", False)
    assert p["http://x/i"] == ("self_image", False)
    assert p["http://x/o"] == ("none", False)

    p = plan("prevscreen")
    assert p["http://x/t"] == ("preview_meta", True)
    assert p["http://x/i"] == ("self_image", False)

    p = plan("screenshot")
    assert p["http://x/t"] == ("screenshot", False)
    assert p["http://x/i"] == ("self_image", False)

    p = plan("none")
    assert p["http://x/t"] == ("none", False)
    assert p["http://x/i"] == ("none", False)


def test_image_name_md5_path(spark):
    import hashlib

    docs = spark.createDataFrame([("http://x/t", "text/html")], "url string, mimetype string")
    (row,) = thumbnail_plan(docs).collect()
    digest = hashlib.md5(b"http://x/t").hexdigest()
    assert row.image_name == f"{digest[:2]}/{digest}"
