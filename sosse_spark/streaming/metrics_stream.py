"""Streaming crawl metrics: watermarked event-time windows (F30's
continuous analog).

The batch engine appends one metrics row per BSP round
(crawl_loop.py); when fetch/index events arrive as a continuous
stream, the idiomatic Spark shape is an event-time tumbling-window
aggregation with a watermark bounding late data: counts finalize once
the watermark passes the window end, later stragglers are dropped
(bounded state — without the watermark, window state grows forever on
a long-running crawl), and the append-mode sink emits each window
exactly once.  This mirrors the reference's minutely CrawlerStats rows
(se/models.py:196-228) under out-of-order delivery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_crawl_metrics"]


def windowed_crawl_metrics(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """events: streaming DataFrame with (url, status:string, t:timestamp)
    — returns per-window counts by outcome, finalized `watermark` after
    each window's end.

    Output: (window_start, window_end, fetched, success, errors,
    redirects, urls_per_sec).  All aggregation is partial-combining
    JVM count/sum; state is bounded by (active windows × output
    cardinality), the watermark retires windows.
    """
    w = events.withWatermark("t", watermark).groupBy(
        F.window("t", window_duration).alias("w")
    )
    n, unit = window_duration.split()[0], window_duration.split()[1].rstrip("s")
    per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    if unit not in per:
        raise ValueError(f"unsupported window unit {unit!r} (second/minute/hour/day)")
    secs = F.lit(int(n) * per[unit])
    agg = w.agg(
        F.count("*").alias("fetched"),
        F.count(F.when(F.col("status") == "success", 1)).alias("success"),
        F.count(F.when(F.col("status") == "error", 1)).alias("errors"),
        F.count(F.when(F.col("status") == "redirect", 1)).alias("redirects"),
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "fetched",
        "success",
        "errors",
        "redirects",
        F.round(F.col("fetched") / secs, 6).alias("urls_per_sec"),
    )
