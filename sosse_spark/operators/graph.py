"""Link-graph analytics over the crawl's links table.

The reference ranks results by text relevance only (PG ts_rank,
se/search.py:104-119) and keeps Link rows precisely so link text can
"weight in the ranking" (se/models.py:43-46); a web-scale pipeline
additionally wants link-based authority.  PageRank (Page et al. 1999,
"The PageRank Citation Ranking") over the engine's (src_url, dst_url)
edges is the canonical form.

Scale shape: each iteration is ONE shuffle of thin (node, share) rows
keyed by dst + a 1-row dangling-mass aggregate; ranks and out-degrees
are (node, double) tables — the payload never rides the loop.  The
edges frame is re-scanned every iteration: callers iterating more than
a few rounds over a parquet-backed link log should persist() a thin
(src, dst) projection first.  For long runs pass checkpoint_every to
cut lineage (the measured multi-megachar-plan trap, CLAUDE.md); the
default 0 keeps the operator a pure DataFrame function for bounded
iteration counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "hits"]


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 0,
) -> DataFrame:
    """Power-iteration PageRank with uniform dangling-mass
    redistribution:

        r_{k+1}(v) = (1-d)/N + d * ( sum_{u->v} r_k(u)/outdeg(u)
                                     + dangling_k / N )

    where dangling_k = sum of r_k over nodes with no out-edges.  Node
    set = union of sources and destinations; duplicate edges count
    once per row (a page linking twice votes twice — matches the
    engine's per-ordinal link rows).  Returns (node, rank) with rank
    rounded to 9 digits; ranks sum to 1 up to float noise."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    d = float(damping)
    src = F.col(src_col)
    dst = F.col(dst_col)
    e = edges.select(src.alias("_src"), dst.alias("_dst"))
    nodes = e.select(F.col("_src").alias("node")).unionByName(
        e.select(F.col("_dst").alias("node"))
    ).distinct()
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    outdeg = e.groupBy(F.col("_src").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("_deg")
    )
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for i in range(iterations):
        rd = ranks.join(outdeg, "node", "left")
        contribs = (
            e.join(rd.filter(F.col("_deg").isNotNull()), e["_src"] == rd["node"])
            .select(F.col("_dst").alias("node"), (F.col("rank") / F.col("_deg")).alias("_share"))
            .groupBy("node")
            .agg(F.sum("_share").alias("_contrib"))
        )
        dangling = rd.filter(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(d)) / F.col("_n")
                    + F.lit(d)
                    * (F.coalesce(F.col("_contrib"), F.lit(0.0)) + F.col("_dang") / F.col("_n"))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, "Authoritative
    Sources in a Hyperlinked Environment"), L1-normalized each half
    step:

        auth_{k+1}(v) ∝ sum_{u->v} hub_k(u)
        hub_{k+1}(u)  ∝ sum_{u->v} auth_{k+1}(v)

    Duplicate edges vote once per row (the engine's per-ordinal link
    rows).  Returns (node, hub, auth) rounded to 9 digits; each column
    sums to 1.  Same scale shape as pagerank: one thin shuffle per half
    step, 1-row normalizers broadcast."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    nodes = e.select(F.col("_src").alias("node")).unionByName(
        e.select(F.col("_dst").alias("node"))
    ).distinct()
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    hub = nodes.crossJoin(F.broadcast(n1)).select("node", (F.lit(1.0) / F.col("_n")).alias("hub"))
    auth = None
    for _ in range(iterations):
        a_raw = (
            e.join(hub, e["_src"] == hub["node"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        a_norm = a_raw.agg(F.sum("_a").alias("_za"))
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_norm))
            .select("node", (F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_za")).alias("auth"))
        )
        h_raw = (
            e.join(auth, e["_dst"] == auth["node"])
            .groupBy(F.col("_src").alias("node"))
            .agg(F.sum("auth").alias("_h"))
        )
        h_norm = h_raw.agg(F.sum("_h").alias("_zh"))
        hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_norm))
            .select("node", (F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_zh")).alias("hub"))
        )
    return (
        hub.join(auth, "node")
        .select("node", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth"))
    )
