"""Deterministic image+caption corpus generator (seed 42, no external data).

Produces the BASELINE.json input_hint table:
  (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
   caption:string, phash:int64)

Generation is DISTRIBUTED: spark.range(n) partitions the id space and a
mapInPandas stage renders/encodes each partition's rows with numpy — the
driver never materializes payloads, so the same code scales from 10^3
unit rows to the 10^7 bench slice (and would to 10^10 on a cluster).

Caption rule (FIXTURES.md §1): words drawn from a fixed list by
(i*2654435761) % len; every third caption embeds digits to exercise
number-normalized change-hashing (se/document.py:286-288).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from sosse_spark.functions.images import encode_image, phash64, render_pattern

__all__ = ["CORPUS_SCHEMA", "caption_for", "dims_for", "fmt_for", "image_id_for", "corpus_df"]

CORPUS_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash bigint"
)

_WORDS = [
    "amber", "basalt", "cedar", "dune", "ember", "fjord", "garnet", "harbor",
    "iris", "juniper", "krill", "lagoon", "mesa", "nectar", "onyx", "prairie",
    "quartz", "reef", "sable", "tundra", "umber", "vale", "willow", "xenon",
    "yarrow", "zephyr",
]
_KNUTH = 2654435761

_W_CYCLE = [16, 32, 64]
_H_CYCLE = [16, 24, 48]
_FMT_CYCLE = ["png", "bmp", "lossy"]


def image_id_for(i: int) -> str:
    return f"img-{i:012d}"


def dims_for(i: int) -> tuple[int, int]:
    return _W_CYCLE[i % 3], _H_CYCLE[(i // 3) % 3]


def fmt_for(i: int) -> str:
    return _FMT_CYCLE[i % 3]


def caption_for(i: int) -> str:
    k = 3 + (i % 5)
    words = [_WORDS[((i + j) * _KNUTH) % len(_WORDS)] for j in range(k)]
    cap = f"caption {i} " + " ".join(words)
    if i % 3 == 0:
        cap += f" rev {i * 7 % 1000}"
    return cap


def _gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for i in pdf["id"]:
            i = int(i)
            w, h = dims_for(i)
            fmt = fmt_for(i)
            px = render_pattern(i, w, h)
            data = encode_image(px, fmt)
            # phash of the DECODED pixels (lossy rows hash the decoded
            # output so stored phash matches what a re-decode computes)
            from sosse_spark.functions.images import decode_image

            ph = phash64(decode_image(data, fmt))
            rows.append(
                {
                    "image_id": image_id_for(i),
                    "bytes": data,
                    "w": w,
                    "h": h,
                    "fmt": fmt,
                    "caption": caption_for(i),
                    "phash": ph,
                }
            )
        yield pd.DataFrame(rows)


def corpus_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed corpus of n rows (deterministic by row index)."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    return spark.range(0, n, numPartitions=parts).mapInPandas(_gen_batches, CORPUS_SCHEMA)
