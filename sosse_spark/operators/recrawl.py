"""Adaptive recrawl scheduling as pure column algebra.

Reference parity (Document._schedule_next, se/document.py:696-712):
  * none     → crawl_next = NULL, crawl_dt = NULL
  * constant → crawl_next = crawl_last + dt_min, crawl_dt = NULL
  * adaptive → dt starts at dt_min; ×2 if content unchanged (cap
    dt_max); ÷2 if changed (floor dt_min); crawl_next = crawl_last + dt
    — golden evolution 1h→2h→3h(cap) in se/test_crawl.py:292-335.

`crawl_dt` is kept in integer SECONDS (LongType) so doubling/halving and
clamping stay exact and parquet/DuckDB-friendly (interval types are not).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["schedule_next_cols"]


def schedule_next_cols(
    changed: Column,
    recrawl_freq: str,
    dt_min: int,
    dt_max: int,
    crawl_last: Column = None,
    crawl_dt: Column = None,
) -> tuple[Column, Column]:
    """→ (new_crawl_next, new_crawl_dt_seconds).

    `changed` must already encode the content-change verdict (hash
    mismatch) for this crawl; rows being scheduled must have crawl_last
    set to the just-finished crawl time.
    """
    crawl_last = F.col("crawl_last") if crawl_last is None else crawl_last
    crawl_dt = F.col("crawl_dt") if crawl_dt is None else crawl_dt

    if recrawl_freq == "none":
        return F.lit(None).cast("timestamp"), F.lit(None).cast("long")

    if recrawl_freq == "constant":
        nxt = F.timestamp_add("SECOND", F.lit(dt_min), crawl_last)
        return nxt, F.lit(None).cast("long")

    if recrawl_freq != "adaptive":
        raise ValueError(f"unknown recrawl_freq {recrawl_freq}")

    new_dt = (
        F.when(crawl_dt.isNull(), F.lit(dt_min))
        .when(~changed, F.least(F.lit(dt_max), crawl_dt * 2))
        .otherwise(F.greatest(F.lit(dt_min), (crawl_dt / 2).cast("long")))
        .cast("long")
    )
    nxt = F.timestamp_add("SECOND", new_dt.cast("int"), crawl_last)
    return nxt, new_dt
