"""Scale-adaptive partitioning helpers (guide §2: derive parallelism
from the cluster, never a constant tuned to one machine)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame) -> DataFrame:
    """Repartition UP to the session's default parallelism ahead of a
    CPU-bound Python (Arrow) stage — only when the current partitioning
    is narrower.

    Why: a narrow parquet scan yields splits by BYTES (one ~20 MB file →
    1-2 partitions), so a mapInPandas kernel whose cost is per-ROW
    Python work runs on 1-2 cores of a 32-core session (measured: the
    50k-page HTML parse ran 2 tasks, 11 s → 32 tasks, ~1.5 s).  The
    round-robin exchange it adds moves each row once and is orders of
    magnitude cheaper than the serialized Python time it unlocks; rows
    are processed independently, so results are unchanged.

    Kernels whose partitioning carries semantics (the fetch stages'
    per-host bucketing) must NOT use this.

    Inputs estimated under ~1 MB (optimizer stats, i.e. compressed
    scan bytes scaled by column pruning) skip the repartition: the
    kernel finishes in well under a second there and the extra exchange
    stage would cost more than it saves (measured +0.3-0.8 s per query
    on the sf0.1 bench's sub-MB frames).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        est = None
    if est is not None and est < (1 << 20):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
