"""Streaming URL-seen dedup: a custom stateful operator
(applyInPandasWithState) — the Structured-Streaming spelling of F9.

The BSP engine dedups per round against the frontier snapshot
(operators/frontier.py); when discovered URLs arrive as a STREAM, the
idiomatic shape is per-bucket state in the state store: group by the
url-hash bucket, keep the bucket's seen-set as state, emit only
first-occurrences.  Exactness matters (the URL-seen invariant forbids
dropping a URL on a filter positive alone — CLAUDE.md), so the state is
the exact int64 hash set packed as one binary blob; a numpy isin probe
per Arrow batch keeps the kernel vectorized.

Scale shape: state is partitioned by bucket exactly like the batch
engine's bloom blobs — each task owns its buckets' state, nothing is
broadcast, and the state store checkpoint makes the dedup resumable
across restarts (tested).  At 10^10 URLs the per-bucket blob is the
same ~GB-scale object the snapshot bloom manages; the batch engine
remains the bulk path, this operator serves continuous drip ingest.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_urlseen", "URLSEEN_STATE_SCHEMA"]

URLSEEN_STATE_SCHEMA = T.StructType([T.StructField("seen_hashes", T.BinaryType())])

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("collection_id", T.IntegerType()),
    ]
)


def _dedupe_kernel(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    if state.exists:
        (blob,) = state.get
        seen = np.frombuffer(blob, dtype=np.int64)
    else:
        seen = np.empty(0, dtype=np.int64)

    new_hashes = [seen]
    for pdf in pdfs:
        h = pdf["url_hash"].to_numpy(dtype=np.int64)
        # unseen vs state AND first occurrence within the batch
        first_in_batch = ~pd.Series(h).duplicated().to_numpy()
        fresh = ~np.isin(h, seen) & first_in_batch
        # also drop repeats across pdfs of this same group/batch
        if len(new_hashes) > 1:
            fresh &= ~np.isin(h, np.concatenate(new_hashes[1:]))
        if fresh.any():
            new_hashes.append(h[fresh])
            yield pdf.loc[fresh, ["bucket", "url", "url_hash", "collection_id"]]

    merged = np.concatenate(new_hashes)
    state.update((merged.tobytes(),))


def streaming_urlseen(urls: DataFrame) -> DataFrame:
    """urls: streaming DataFrame with (url, collection_id) — returns the
    first-ever occurrence of each url_hash across ALL micro-batches
    (state-store backed, restart-safe).

    Input may be raw (url, collection_id); bucket/url_hash are derived
    here exactly as the batch engine derives them so the two paths
    agree on identity.
    """
    keyed = urls.withColumn("url_hash", F.xxhash64("url")).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(64)).cast("int")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedupe_kernel,
        outputStructType=_OUT_SCHEMA,
        stateStructType=URLSEEN_STATE_SCHEMA,
        outputMode="append",  # first-occurrences only — never retracted
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
