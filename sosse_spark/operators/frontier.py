"""Frontier table + URL-seen set (partitioned Bloom prefilter + exact anti-join).

Reference parity: the URL-seen set is the unique (url, collection) key
(se/document.py:171); dedup is get_or_create keeping max depth budget on
collision (se/document.py:687-694).

Spark shape (north rule):
  * frontier rows are hash-bucketed by pmod(xxhash64(url), n_buckets) —
    the bucket column drives snapshot-partition pruning and co-partitions
    every URL-seen structure with the frontier itself.
  * a PARTITIONED BLOOM FILTER (one bitmap blob per bucket, double-hashed
    probes off the int64 xxhash64 url_hash) prefilters candidate links:
    filter-negative rows are DEFINITIVELY new (no join needed);
    filter-positive rows fall through to the exact anti-join — a Bloom
    false positive can only cost a join probe, never drop a URL.
  * membership testing is a cogrouped applyInPandas on the bucket key:
    each task sees (links-of-bucket, bloom-blob-of-bucket) — no blob
    broadcast, no blob duplication per row; this is the shape that holds
    when the bloom is 12 GB at 10^10 URLs.

`id` is the deterministic admission ordinal (round_no << 32 | rank) that
replaces the reference's autoincrement PK as the priority tiebreak
(se/document.py:847-848) — N-way parallel rounds reproduce single-worker
ordering within BSP-round semantics.
"""

from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "FRONTIER_SCHEMA",
    "BLOOM_SCHEMA",
    "frontier_row_defaults",
    "with_bucket",
    "bloom_build",
    "bloom_prefilter",
    "urlseen_dedup",
    "merge_frontier",
    "assign_ids",
]

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("url_domain", T.StringType(), True),
        T.StructField("url_path", T.StringType(), True),
        T.StructField("collection_id", T.IntegerType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("crawl_first", T.TimestampType(), True),
        T.StructField("crawl_last", T.TimestampType(), True),
        T.StructField("crawl_next", T.TimestampType(), True),
        T.StructField("crawl_dt", T.LongType(), True),  # seconds (interval math)
        T.StructField("crawl_recurse", T.IntegerType(), True),
        T.StructField("manual_crawl", T.BooleanType(), False),
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("worker_no", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("error_hash", T.StringType(), True),
        T.StructField("robotstxt_rejected", T.BooleanType(), False),
        T.StructField("redirect_url", T.StringType(), True),
        T.StructField("content_hash", T.StringType(), True),
        # HTTP-cache fields (P12, se/html_cache.py:56-156): server
        # max-age (seconds), last content-change time (F27 tail,
        # se/document.py:456-457) and the payload's actual download time
        # (≙ HTMLAsset.download_date — cache hits must NOT refresh it or
        # a fresh row would stay fresh forever) drive the pre-fetch gate
        T.StructField("max_age", T.LongType(), True),
        T.StructField("modified_date", T.TimestampType(), True),
        T.StructField("payload_date", T.TimestampType(), True),
        # user tags persist through recrawl (se/test_crawl.py:803-820:
        # Document.tags M2M survives re-index; crawl never writes it)
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("lineage_round", T.IntegerType(), True),
        T.StructField("lineage_part", T.IntegerType(), True),
    ]
)

BLOOM_SCHEMA = "bucket int, blob binary, n bigint"

_BLOOM_K = 5  # probes per key


def frontier_row_defaults() -> dict:
    return {
        "crawl_first": None,
        "crawl_last": None,
        "crawl_next": None,
        "crawl_dt": None,
        "crawl_recurse": 0,
        "manual_crawl": False,
        "retries": 0,
        "worker_no": None,
        "error": None,
        "error_hash": None,
        "robotstxt_rejected": False,
        "redirect_url": None,
        "content_hash": None,
        "max_age": None,
        "modified_date": None,
        "payload_date": None,
        "tags": None,
        "lineage_round": None,
        "lineage_part": None,
    }


def with_bucket(df: DataFrame, n_buckets: int, url_col: str = "url") -> DataFrame:
    return df.withColumn("url_hash", F.xxhash64(F.col(url_col))).withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int")
    )


# ---------------------------------------------------------------------------
# Bloom bitmap kernels (vectorized numpy over the int64 url_hash)
# ---------------------------------------------------------------------------

def _blob_pack(blob: bytes | bytearray) -> bytes:
    """Bloom bitmaps ship zlib-compressed: at the target ~4% fill the
    512 KiB bitmap compresses ~100×, and blob transfer between JVM and
    Python workers (Arrow IPC) was the measured anti-scaling component
    of bloom build/probe at high core counts."""
    return zlib.compress(bytes(blob), 1)


def _blob_unpack(packed: bytes, m_bits: int) -> bytearray:
    return bytearray(zlib.decompress(bytes(packed))) if packed else bytearray(m_bits // 8)


def _probe(hashes: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, k) probe bit-indexes via double hashing h1 + j*h2."""
    u = hashes.astype(np.uint64)
    h1 = u & np.uint64(0xFFFFFFFF)
    h2 = (u >> np.uint64(32)) | np.uint64(1)  # force odd so probes spread
    j = np.arange(_BLOOM_K, dtype=np.uint64)[None, :]
    return ((h1[:, None] + j * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _bloom_set(blob: bytearray, hashes: np.ndarray, m_bits: int) -> None:
    idx = _probe(hashes, m_bits).ravel()
    arr = np.frombuffer(blob, dtype=np.uint8)
    np.bitwise_or.at(arr, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def _bloom_test(blob: bytes, hashes: np.ndarray, m_bits: int) -> np.ndarray:
    idx = _probe(hashes, m_bits)
    arr = np.frombuffer(blob, dtype=np.uint8)
    bits = (arr[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def bloom_build(
    rows: DataFrame,
    prev_bloom: Optional[DataFrame],
    m_bits: int = 1 << 20,
) -> DataFrame:
    """(Re)build per-bucket blobs from rows(bucket, url_hash), merging
    into prev_bloom blobs when given (incremental per round)."""
    spark = rows.sparkSession
    hashes = rows.select("bucket", "url_hash")
    if prev_bloom is not None:
        prev = prev_bloom.select(
            "bucket", F.col("blob").alias("_prev_blob"), F.col("n").alias("_prev_n")
        )
        hashes = hashes.join(prev, "bucket", "left")
    else:
        hashes = hashes.withColumn("_prev_blob", F.lit(None).cast("binary")).withColumn(
            "_prev_n", F.lit(None).cast("long")
        )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        prev_blob = pdf["_prev_blob"].iloc[0]
        blob = _blob_unpack(prev_blob, m_bits)
        h = pdf["url_hash"].to_numpy(dtype=np.int64)
        _bloom_set(blob, h, m_bits)
        prev_n = pdf["_prev_n"].iloc[0]
        n = int(prev_n) if prev_n is not None and not pd.isna(prev_n) else 0
        return pd.DataFrame([{"bucket": bucket, "blob": _blob_pack(blob), "n": n + len(pdf)}])

    _ = spark
    # Only TOUCHED buckets come back (merged with their previous blob);
    # SnapshotTable.commit leaves untouched buckets on their old snapshot.
    return hashes.groupBy("bucket").applyInPandas(build, BLOOM_SCHEMA)


def bloom_prefilter(links: DataFrame, bloom: Optional[DataFrame], m_bits: int = 1 << 20) -> DataFrame:
    """Append `maybe_seen`: False ⇒ definitively unseen (bloom negative).

    Cogrouped on bucket so each task pairs one bucket of links with that
    bucket's single blob row — partition-local, broadcast-free.
    """
    if bloom is None:
        return links.withColumn("maybe_seen", F.lit(False))

    out_schema = T.StructType(
        links.schema.fields + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    link_cols = [f.name for f in links.schema.fields]

    def test(lpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=link_cols + ["maybe_seen"])
        if bpdf.empty:
            lpdf = lpdf.copy()
            lpdf["maybe_seen"] = False
            return lpdf
        blob = bytes(_blob_unpack(bpdf["blob"].iloc[0], m_bits))
        h = lpdf["url_hash"].to_numpy(dtype=np.int64)
        lpdf = lpdf.copy()
        lpdf["maybe_seen"] = _bloom_test(blob, h, m_bits)
        return lpdf

    return (
        links.groupBy("bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(test, out_schema)
    )


# ---------------------------------------------------------------------------
# URL-seen dedup + merge
# ---------------------------------------------------------------------------

def urlseen_dedup(
    candidates: DataFrame,
    frontier: Optional[DataFrame],
    bloom: Optional[DataFrame],
    m_bits: int = 1 << 20,
) -> DataFrame:
    """New-URL admission: batch-internal dedup (keep max crawl_recurse,
    min discovery order — se/document.py:692-693) → Bloom prefilter →
    exact anti-join on (url, collection_id) for bloom-positives only.

    Requires columns: url, url_hash, bucket, collection_id,
    crawl_recurse, disc_order.
    """
    deduped = candidates.groupBy("url", "url_hash", "bucket", "collection_id").agg(
        F.max("crawl_recurse").alias("crawl_recurse"),
        F.min("disc_order").alias("disc_order"),
        F.first("url_domain").alias("url_domain"),
        F.first("url_path").alias("url_path"),
    )

    if bloom is None and frontier is not None:
        # no filter info → everything must face the exact anti-join
        flagged = deduped.withColumn("maybe_seen", F.lit(True))
    else:
        flagged = bloom_prefilter(deduped, bloom, m_bits)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")

    if frontier is not None:
        # Bloom FPs fall through to the authoritative anti-join — the
        # projection keeps the join payload to two thin columns.
        seen = frontier.select("url", "collection_id")
        survivors = suspects.join(seen, ["url", "collection_id"], "left_anti")
    else:
        survivors = suspects

    return definitely_new.unionByName(survivors)


def assign_ids(
    new_rows: DataFrame, round_no: int, base_rank: int = 0, n_parts: int = 32
) -> DataFrame:
    """Deterministic admission ordinal: id = round_no·2^32 + rank, ranked
    by within-round discovery order (parent rank, link ordinal) — the
    reproducible stand-in for the reference's autoincrement PK.

    Scale shape: a bare Window.orderBy would pull every inserted row of
    the round through ONE task (a 10^7-insert round dies there).  Instead:
    range-repartition on the rank key, per-partition row_number, then add
    per-partition offsets (a collect bounded by n_parts, never by rows).
    Range partitions are ordered, so offset + local rank reproduces the
    exact global (disc_order, url) rank regardless of boundary placement.

    base_rank offsets the first id (seeding twice within one round must
    not reuse ranks).
    """
    part = new_rows.repartitionByRange(n_parts, F.col("disc_order").asc(), F.col("url").asc())
    part = part.withColumn("_pid", F.spark_partition_id())
    local = part.withColumn(
        "_lr",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(F.col("disc_order").asc(), F.col("url").asc())
        ),
    )
    counts = {r["_pid"]: r["n"] for r in local.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, base_rank
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_col = F.lit(0).cast("long")
    for pid, off in offsets.items():
        off_col = F.when(F.col("_pid") == pid, F.lit(off).cast("long")).otherwise(off_col)
    return local.withColumn(
        "id",
        (F.lit(round_no).cast("long") * F.lit(1 << 32).cast("long")) + off_col + F.col("_lr"),
    ).drop("_pid", "_lr")


def merge_frontier(
    frontier: Optional[DataFrame],
    replacements: Optional[DataFrame],
    inserts: Optional[DataFrame],
) -> DataFrame:
    """MERGE: rows in `replacements` overwrite their (url, collection_id)
    match; `inserts` are new keys.  Caller commits only the touched
    buckets (SnapshotTable bucket-granular rewrite)."""
    parts = []
    if frontier is not None:
        if replacements is not None:
            keys = replacements.select("url", "collection_id")
            frontier = frontier.join(keys, ["url", "collection_id"], "left_anti")
        parts.append(frontier)
    if replacements is not None:
        parts.append(replacements)
    if inserts is not None:
        parts.append(inserts)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
