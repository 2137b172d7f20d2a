"""P11 (batchable core): HTML-snapshot asset routing + registry.

The reference's snapshot pipeline (HTMLSnapshot.handle_assets /
download_asset, se/html_snapshot.py:207-441) walks the DOM in a
browser; the DOM walk and CSS parsing are browser-bound (§7.4), but the
per-asset decision algebra it applies is pure data flow and belongs in
the engine:

  1. cache hit → reuse the existing asset's filename, refcount++
     (se/html_snapshot.py:407-410, P12/P13 interplay)
  2. download error / size-cap (SOSSE_MAX_HTML_ASSET_SIZE via
     HTMLCache.download) → the asset becomes a .txt ERROR PAYLOAD
     ("An error occured while downloading {url}:…"),
     se/html_snapshot.py:411-420
  3. url/mime exclusion regexes → routed to the 'excluded' placeholder,
     never stored (se/html_snapshot.py:384-386,404-406)
  4. text/html assets → routed back into the crawl ('/html/' + url),
     never stored as an asset (se/html_snapshot.py:400-401)
  5. everything else → content-hash filename (P14) under the snapshot
     prefix; identical payloads from different URLs share one file

Spark shape: assets arrive ONE ROW PER DISTINCT URL (the caller
dedups — the reference's `asset_urls` set), already fetched by the
fetch stage; routing is a single codegen'd projection, the registry
refcount is one groupBy.  Nothing here shuffles payload bytes except
the md5 input itself.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sosse_spark.operators.assets import content_filename

__all__ = ["route_assets", "snapshot_refcounts"]


def route_assets(
    assets: DataFrame,
    max_size: int = 1 << 20,
    exclude_url_re: Optional[str] = None,
    exclude_mime_re: Optional[str] = None,
    snapshot_prefix: str = "/snap/",
    url_col: str = "asset_url",
    content_col: str = "content",
    mime_col: str = "mimetype",
    error_col: str = "error",
) -> DataFrame:
    """→ input + (ref, filename, stored).

    `ref` is the string the snapshot rewrites the src/href to; `stored`
    marks rows whose payload is written to the asset store (drives the
    refcount registry).  Error and oversize rows store a .txt error
    payload and still get a ref — exactly the reference's fallback.
    """
    url = F.col(url_col)
    err_payload = F.concat(
        F.lit("An error occured while downloading "), url, F.lit(":\n"),
        F.coalesce(F.col(error_col), F.lit("PageTooBig")),
    ).cast("binary")
    is_err = F.col(error_col).isNotNull() | (F.length(F.col(content_col)) > max_size)
    excl_url = url.rlike(exclude_url_re) if exclude_url_re else F.lit(False)
    excl_mime = F.col(mime_col).rlike(exclude_mime_re) if exclude_mime_re else F.lit(False)
    is_html = F.col(mime_col) == "text/html"

    eff_content = F.when(is_err, err_payload).otherwise(F.col(content_col))
    eff_mime = F.when(is_err, F.lit("text/plain")).otherwise(F.col(mime_col))
    fname = content_filename(eff_content, eff_mime)

    # precedence mirrors download_asset: url exclusion short-circuits the
    # fetch (se/html_snapshot.py:384-386); then error/size; then
    # html-routing and mime exclusion of successfully fetched payloads
    stored = ~excl_url & (is_err | (~is_html & ~excl_mime))
    ref = (
        F.when(excl_url, F.lit("/html/excluded/url"))
        .when(is_err, F.concat(F.lit(snapshot_prefix), fname))
        .when(is_html, F.concat(F.lit("/html/"), url))
        .when(excl_mime, F.lit("/html/excluded/mime"))
        .otherwise(F.concat(F.lit(snapshot_prefix), fname))
    )
    return assets.withColumn("stored", stored).withColumn(
        "filename", F.when(stored, fname)
    ).withColumn("ref", ref)


def snapshot_refcounts(refs: DataFrame, routed: DataFrame, url_col: str = "asset_url") -> DataFrame:
    """Asset registry counts: one row per stored filename with the
    number of (doc, asset) references pointing at it — identical
    payloads under different URLs fold into ONE filename row (the
    content-hash dedup the reference gets from HTMLCache.write_asset).
    `refs` is the raw (doc_url, asset_url) edge list."""
    stored = routed.filter(F.col("stored")).select(url_col, "filename")
    return (
        refs.join(stored, url_col)
        .groupBy("filename")
        .agg(F.count("*").alias("ref_count"))
    )
