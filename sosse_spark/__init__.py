"""sosse_spark — a PySpark-native crawl-scheduler / analytics engine.

A from-scratch reimplementation of the observable behavior of the
biolds/sosse crawl scheduler (URL frontier, URL-seen set, politeness,
robots.txt, priority queue, adaptive recrawl, checkpoint/resume,
metrics) re-expressed as idiomatic PySpark: DataFrame column algebra,
window ranking, broadcast rule joins, Arrow-vectorized pandas UDFs for
the URL kernel and image codecs, and a BSP micro-batch crawl loop over
atomic parquet snapshot tables.

Layout:
  functions/  scalar kernels: URL canonicalization, hashing, text, images
  operators/  frontier dedup, admission, scheduler, robots, recrawl,
              dedup/similarity/text-quality training-data ops
  sources/    snapshot table layer + deterministic corpus/webgraph fixtures
  plans/      one-crawl-round DAG assembly
  streaming/  the BSP driver loop (checkpoint, resume, metrics)
"""

__version__ = "0.1.0"
