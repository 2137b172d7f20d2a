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
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
