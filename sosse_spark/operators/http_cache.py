"""P12: HTTP cache semantics — freshness gate before the fetch stage.

Reference: HTMLCache._max_age_check/_heuristic_check/download
(se/html_cache.py:56-156):
  * max-age rule: a payload fetched at T with Cache-Control max-age=A is
    fresh (no refetch at all) while now − T < A;
  * heuristic 10% rule: with no cache-control but a known modification
    date M, the payload is fresh while now − T < 0.1 × (T − M);
  * otherwise the fetch revalidates (ETag/If-Modified-Since ≙ our
    content_hash comparison — the engine's unchanged-hash path already
    skips re-parsing, F27).

At recrawl scale this is the biggest fetch-cost reducer: fresh rows
skip the fetch stage entirely (the crawl loop splits the claimed batch
on this predicate and reschedules the fresh slice as unchanged).  Pure
column algebra — evaluated inside the scan, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["cache_fresh_col"]


def cache_fresh_col(
    now_col: Column,
    payload_date: str = "payload_date",
    max_age: str = "max_age",
    modified_date: str = "modified_date",
    heuristic_frac: float = 0.1,
) -> Column:
    """True ⇒ the cached payload is still fresh: skip the fetch.

    Ages against the payload's DOWNLOAD time (≙ HTMLAsset.download_date)
    — a cache hit must not reset the clock, or a max-age'd row would
    never be refetched."""
    dl_s = F.unix_timestamp(F.col(payload_date))
    age = F.unix_timestamp(now_col) - dl_s
    by_max_age = F.col(max_age).isNotNull() & (age < F.col(max_age))
    by_heuristic = (
        F.col(max_age).isNull()
        & F.col(modified_date).isNotNull()
        & (age < heuristic_frac * (dl_s - F.unix_timestamp(F.col(modified_date))))
    )
    return F.col(payload_date).isNotNull() & (by_max_age | by_heuristic)
