"""Content-hash / change-detection kernels.

Reference parity: Document._hash_content (se/document.py:274-298) — md5
of text content with optional number-normalization (re.sub("[0-9]+","0"),
hash_mode per se/collection.py:71-76); binary payloads hash raw bytes.
For the image corpus the perceptual `phash` column plays the role of
`content_hash`.

Everything here is plain Spark column algebra (JVM-side, codegen'd) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_numbers",
    "content_hash",
    "binary_hash",
    "url_hash",
    "error_hash",
]


def normalize_numbers(col: Column) -> Column:
    """Replace digit runs with '0' (hash_mode=no_numbers,
    se/document.py:286-288) so counters/timestamps don't count as change."""
    return F.regexp_replace(col, "[0-9]+", "0")


def content_hash(text_col: Column, no_numbers: bool = False) -> Column:
    """md5 hex of (optionally number-normalized) text — the change-detection
    hash (se/document.py:274-298)."""
    c = normalize_numbers(text_col) if no_numbers else text_col
    return F.md5(c.cast("string"))


def binary_hash(bytes_col: Column) -> Column:
    """md5 hex of raw payload bytes (se/document.py:295-298)."""
    return F.md5(bytes_col)


def url_hash(url_col: Column) -> Column:
    """64-bit identity hash of the canonical URL — keys the URL-seen set
    and the frontier hash-partitioning (SURVEY §2 F9)."""
    return F.xxhash64(url_col)


def error_hash(err_col: Column) -> Column:
    """md5 of the error text, '' for no error (se/document.py:579-584)."""
    return F.when(F.coalesce(err_col, F.lit("")) == "", F.lit("")).otherwise(F.md5(err_col))
