"""F30 tail: CrawlerStats time-series rollup + retention
(se/models.py:189-228).

The reference appends one MINUTELY row per stats tick and folds it into
a DAILY row keyed at midnight (indexing_speed accumulates, queued_url
takes the max, doc_count takes the latest), deleting minutely rows
older than 24 h and daily rows older than 365 d.  As batch algebra over
the append-only metrics log that is: retention filters + one
day-grouped aggregation — partition-prunable by day at scale (retention
= partition drop, as §4 plans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["crawler_stats_rollup"]


def crawler_stats_rollup(minutely: DataFrame, now: Column) -> DataFrame:
    """→ union of retained MINUTELY rows and derived DAILY rows.

    Input: (t timestamp, doc_count long, queued_url long,
    indexing_speed long).  Daily semantics per the reference: speed
    accumulates over the day's ticks, queued_url is the day max,
    doc_count is the latest tick's value (se/models.py:211-219; here
    `max_by(doc_count, t)` — the engine-portable spelling of "last").
    Retention: minutely ≥ now−24 h, daily ≥ now−365 d
    (se/models.py:198-200).
    """
    kept_min = minutely.filter(F.col("t") >= F.timestamp_add("HOUR", F.lit(-24), now)).select(
        F.lit("M").alias("freq"), "t", "doc_count", "queued_url", "indexing_speed"
    )
    daily = (
        minutely.groupBy(F.date_trunc("day", F.col("t")).alias("t"))
        .agg(
            F.max_by("doc_count", "t").alias("doc_count"),
            F.max("queued_url").alias("queued_url"),
            F.sum("indexing_speed").alias("indexing_speed"),
        )
        .filter(F.col("t") >= F.timestamp_add("DAY", F.lit(-365), now))
        .select(F.lit("D").alias("freq"), "t", "doc_count", "queued_url", "indexing_speed")
    )
    return kept_min.unionByName(daily)
