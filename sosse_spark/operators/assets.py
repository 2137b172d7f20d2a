"""P13/P14: asset registry maintenance — content-hash filenames and
refcount GC.

Reference:
  * content-hash filename: md5(content)[:10] + mimetype-guessed
    extension (HTMLCache.write_asset/html_filename,
    se/html_cache.py:172-236) — identical payloads referenced from many
    pages share one file;
  * refcount GC: HTMLAsset.init_ref_count/increment_ref/remove_file_ref
    (se/html_asset.py:63-113) — per-filename reference counting with
    delete-at-zero.

Spark shape: the GC is exactly the batch job the survey priced at one
line — groupBy(filename).sum(ref_delta) with map-side combine; the
filename is codegen'd column algebra over the binary payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["EXT_FOR_MIME", "content_filename", "asset_refcount_gc"]

EXT_FOR_MIME = {
    "image/png": ".png",
    "image/bmp": ".bmp",
    "image/jpeg": ".jpg",
    "image/x-slc": ".slc",
    "text/html": ".html",
    "text/plain": ".txt",
    "application/xml": ".xml",
    "application/rss+xml": ".xml",
    "application/atom+xml": ".xml",
    "application/octet-stream": ".bin",
}


def content_filename(content_col: Column, mimetype_col: Column, max_len: int = 64) -> Column:
    """md5(content)[:10] + extension (se/html_cache.py:172-236); the
    length clamp mirrors the reference's fs-name limit handling."""
    ext = F.lit(EXT_FOR_MIME["application/octet-stream"])
    for mime, e in EXT_FOR_MIME.items():
        ext = F.when(mimetype_col == mime, F.lit(e)).otherwise(ext)
    return F.substring(F.concat(F.substring(F.md5(content_col), 1, 10), ext), 1, max_len)


def asset_refcount_gc(assets: DataFrame, filename_col: str = "filename", delta_col: str = "ref_delta") -> DataFrame:
    """Fold the ±1 reference stream per filename; rows at Σ ≤ 0 are the
    delete list (se/html_asset.py:63-113).  One hash shuffle on the
    filename with map-side partial aggregation.
    → (filename, ref_count) for every filename, plus `deletable`."""
    return (
        assets.groupBy(filename_col)
        .agg(F.sum(delta_col).alias("ref_count"))
        .withColumn("deletable", F.col("ref_count") <= 0)
    )
