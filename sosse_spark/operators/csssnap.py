"""P11 (CSS half): ``url(...)`` asset extraction + snapshot CSS rewrite.

Re-expresses the reference's internal CSS parser — the last batchable
piece of the HTML-snapshot pipeline that was still out of scope:

* ``extract_css_url`` (se/html_snapshot.py:40-87): a character scanner
  over CSS text that yields alternating (literal, asset-URL) segments,
  handling optional single/double quotes, backslash escapes, and
  whitespace inside ``url( ... )``, and demoting non-browsable targets
  (``#fragment``, ``data:``, ``javascript:`` …) back to literal text.
* ``InternalCSSParser.handle_css`` (se/html_snapshot.py:92-117):
  absolutize each browsable asset URL against the page base, force
  ``text/css`` for ``*.css`` targets (libmagic misidentifies CSS), and
  re-emit the stylesheet with every asset as ``url("<resolved>")``.
* ``InternalCSSParser.css_extract_assets`` (se/html_snapshot.py:120-127):
  list the asset filenames a stored (already-rewritten) stylesheet
  references under the snapshot prefix — the GC input.

Spark shape: the scanner is inherently imperative, so it runs ONCE per
stylesheet inside a narrow ``mapInPandas`` kernel that explodes each
sheet into thin (seq, is_url, segment, abs_url) rows — no shuffle, no
state, pipelines with the fetch stage exactly like the HTML DOM walk
(operators/htmlparse.py).  Everything downstream is pure JVM algebra:
asset numbering is one bounded window per sheet, the snapshot rewrite
is an equi-join against the routed-asset table (operators/snapshot.py
``route_assets``) plus an ``array_sort``/``array_join`` reassembly —
payload bytes never enter the Python boundary.

Declared deltas vs the reference scanner (degenerate inputs only):

* truncated input ending inside ``url(`` (or on a trailing backslash)
  raises IndexError in the reference (it indexes before bounds-checking,
  se/html_snapshot.py:54,75); this kernel bounds-checks and treats the
  truncated span as literal text.
* an empty quoted target (``url('')``) leaves the reference's ``quote``
  state armed for the NEXT span (it only resets ``quote`` when a
  non-empty URL was collected, se/html_snapshot.py:86); this kernel
  resets per span.
* zero-length literal segments (two back-to-back ``url()`` spans) are
  not emitted as rows; reassembly is unaffected.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sosse_spark.functions.urlnorm import absolutize_url, has_browsable_scheme

__all__ = [
    "extract_css_url",
    "css_segments",
    "css_asset_urls",
    "css_rewrite",
    "css_extract_assets",
]

CSS_SEGMENT_SCHEMA = (
    "url string, seq int, is_url boolean, segment string, "
    "abs_url string, force_css boolean"
)


def extract_css_url(css: str) -> Iterator[tuple[bool, str]]:
    """Yield (is_url, segment) pairs over `css`.

    Faithful re-expression of the reference scanner's observable
    behavior (se/html_snapshot.py:40-87): literal segments carry the
    original text verbatim; URL segments carry the unquoted, unescaped
    target iff it has a browsable scheme, otherwise the whole
    ``url(...)`` span stays literal.  See the module docstring for the
    three declared degenerate-input deltas.
    """
    n = len(css)
    prev = 0
    current = 0
    while True:
        current = css.find("url(", current)
        if current == -1:
            yield False, css[prev:]
            return
        yield False, css[prev:current]

        prev = current
        current += 4
        url = ""
        quote = None
        while current < n and css[current] == " ":
            current += 1
        if current < n and css[current] in ('"', "'"):
            quote = css[current]
            current += 1
        while current < n and (
            (quote is not None and css[current] != quote)
            or (quote is None and css[current] != ")")
        ):
            if css[current] == "\\":
                current += 1
                if current >= n:
                    break
            url += css[current]
            current += 1
        if quote is not None and current < n:
            current += 1  # closing quote
        while current < n and css[current] == " ":
            current += 1
        if current < n and css[current] == ")":
            current += 1

        if url:
            if has_browsable_scheme(url):
                yield True, url
            else:
                yield False, css[prev:current]
            prev = current
        # empty target: like the reference, prev stays put so the whole
        # span folds into the next literal segment


def css_segments(
    sheets: DataFrame,
    url_col: str = "url",
    base_col: str = "base_url",
    css_col: str = "css",
) -> DataFrame:
    """Explode stylesheets into scanner segments (one narrow kernel).

    → (url, seq, is_url, segment, abs_url, force_css): `segment` is
    exactly what the reference generator yields (the raw URL text for
    asset rows, the literal span otherwise); `abs_url` resolves asset
    rows against `base_col` (se/html_snapshot.py:107) and is NULL on
    literal rows; `force_css` marks ``*.css`` targets whose mimetype
    the snapshot must pin to text/css (se/html_snapshot.py:108-111).
    """

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_url, base, css in zip(pdf[url_col], pdf[base_col], pdf[css_col]):
                if css is None:
                    continue
                for seq, (is_url, segment) in enumerate(extract_css_url(css)):
                    if not segment:
                        continue
                    abs_url = None
                    if is_url:
                        try:
                            abs_url = absolutize_url(base or "", segment)
                        except ValueError:
                            # unresolvable base/target must not kill the
                            # stage — keep the raw target (the rewrite
                            # then re-emits it verbatim inside url(""))
                            abs_url = segment
                    rows.append(
                        (
                            doc_url,
                            seq,
                            bool(is_url),
                            segment,
                            abs_url,
                            bool(abs_url.endswith(".css")) if abs_url else None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "seq", "is_url", "segment", "abs_url", "force_css"],
            )

    return sheets.select(
        F.col(url_col).alias(url_col),
        F.col(base_col).alias(base_col),
        F.col(css_col).alias(css_col),
    ).mapInPandas(run, CSS_SEGMENT_SCHEMA)


def css_asset_urls(segments: DataFrame) -> DataFrame:
    """Asset listing per sheet: (url, asset_no, asset_url, force_css).

    `asset_no` numbers the sheet's browsable assets 1..k in document
    order — the per-sheet window is bounded by the sheet's own url()
    count, never global.
    """
    w = Window.partitionBy("url").orderBy("seq")
    return (
        segments.filter(F.col("is_url"))
        .withColumn("asset_no", F.row_number().over(w))
        .select(
            "url",
            "asset_no",
            F.col("abs_url").alias("asset_url"),
            "force_css",
        )
    )


def css_rewrite(
    segments: DataFrame,
    refs: Optional[DataFrame] = None,
    ref_url_col: str = "asset_url",
    ref_col: str = "ref",
) -> DataFrame:
    """Reassemble rewritten stylesheets: (url, css_out).

    Asset rows become ``url("<ref>")`` — `ref` taken from the routed
    asset table when given (snapshot.route_assets output keyed by
    `ref_url_col`), else the absolutized URL itself (the reference's
    handle_css with download_asset as identity).  Pure JVM after the
    scan: one equi-join + per-sheet array_sort/array_join — the window
    over segments is per-sheet, the join side is the deduped asset
    registry (small; broadcastable by AQE at real scale).
    """
    seg = segments.alias("s")
    if refs is not None:
        seg = seg.join(
            F.broadcast(refs.select(F.col(ref_url_col).alias("_ru"), F.col(ref_col).alias("_ref"))),
            F.col("s.abs_url") == F.col("_ru"),
            "left",
        )
    else:
        seg = seg.withColumn("_ref", F.lit(None).cast("string"))
    piece = F.when(
        F.col("s.is_url"),
        F.concat(F.lit('url("'), F.coalesce(F.col("_ref"), F.col("s.abs_url")), F.lit('")')),
    ).otherwise(F.col("s.segment"))
    return (
        seg.select(F.col("s.url").alias("url"), F.col("s.seq").alias("seq"), piece.alias("piece"))
        .groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "piece"))),
                    lambda x: x["piece"],
                ),
                "",
            ).alias("css_out")
        )
    )


def css_extract_assets(
    segments: DataFrame, snapshot_prefix: str = "/snap/"
) -> DataFrame:
    """GC input over STORED stylesheets: distinct (url, asset_filename).

    Matches css_extract_assets (se/html_snapshot.py:120-127): only
    url() targets under the snapshot prefix count, prefix stripped.
    Run it on segments of already-rewritten sheets (the reference does
    exactly that before deleting a snapshot's assets).
    """
    plen = len(snapshot_prefix)
    return (
        segments.filter(F.col("is_url") & F.col("segment").startswith(snapshot_prefix))
        .select("url", F.col("segment").substr(F.lit(plen + 1), F.lit(1 << 20)).alias("asset_filename"))
        .distinct()
    )
