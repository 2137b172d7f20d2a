"""LAION-style image+caption pair curation: size/aspect/caption gates +
a CLIP-cosine alignment filter over deterministic stub embeddings.

This is the training-data step immediately DOWNSTREAM of the engine's
image crawl (the BASELINE.json input_hint table: image_id, bytes, w, h,
fmt, caption, phash).  Public pipeline being re-expressed: LAION-400M
(Schuhmann et al. 2021, arXiv:2111.02114 §2 "Filtering") and LAION-5B
(Schuhmann et al. 2022, arXiv:2210.08402 §3.2) drop web-crawled pairs
with (a) captions shorter than a word/char floor, (b) images below a
pixel floor or beyond an aspect-ratio cap, (c) CLIP image-text cosine
similarity under a threshold (0.3 for LAION-400M English).

The sandbox has no CLIP model, so — exactly like the audio/video stub
policy (operators/multimodal.py) — the two EMBEDDINGS are deterministic
fakes while every piece of Spark plumbing is the real shape a
CLIP-scored pipeline runs at 100 TB:

  * caption embedding: hashed-token signed bag (md5 bucket -> dim,
    md5 bit -> sign) — ONE token explode + ONE map-side-combinable
    aggregation (15 conditional sums), the hashed_classifier_score
    shape (functions/text.py:408).
  * image embedding: the 15 phash nibbles, centered — pure column
    algebra on an int64 already carried by the crawl tables (no
    payload decode in this stage; a real CLIP scorer slots in as a
    mapInPandas over `bytes` with the same output schema).
  * cosine + threshold gates: fixed-width JVM expressions, whole-stage
    codegen, no UDF, no join (metadata rides through the single
    groupBy via `first`).

Tokenization is the shared `_lm_tokens` contract (functions/text.py:349)
so the DuckDB oracle recomputes the identical vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sosse_spark.functions.text import _lm_tokens

__all__ = [
    "image_vec_from_phash",
    "caption_dim_sign",
    "alignment_cos",
    "curate_image_captions",
]

DIMS = 15  # one per phash nibble (60-bit phash, functions/images.py)


def image_vec_from_phash(phash: Column) -> list[Column]:
    """The stub image embedding: phash nibble d, centered to [-7.5, 7.5].
    Fixed-width shift/mask algebra — codegen'd, no HOF."""
    return [
        (F.shiftright(phash, 4 * d).bitwiseAND(F.lit(15)).cast("double") - F.lit(7.5)).alias(
            f"_i{d}"
        )
        for d in range(DIMS)
    ]


def caption_dim_sign(tok: Column) -> tuple[Column, Column]:
    """Hashed-token feature: md5-derived (dimension, sign) per token —
    the hashing-trick bag (same md5 bucket rule as
    hashed_classifier_score; Spark xxhash64 does not exist in DuckDB)."""
    hh = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
    dim = F.pmod(hh, F.lit(DIMS))
    sign = F.when(F.shiftright(hh, 4).bitwiseAND(F.lit(1)) == 0, F.lit(1)).otherwise(F.lit(-1))
    return dim, sign


def alignment_cos(tvec: list[Column], ivec: list[Column]) -> Column:
    """cosine(caption bag, phash embedding); 0.0 when either side is the
    zero vector (empty caption).  Fixed 15-term sums — stays inside
    whole-stage codegen."""
    dot = sum((t * i for t, i in zip(tvec, ivec)), F.lit(0.0))
    tn = F.sqrt(sum((t * t for t in tvec), F.lit(0.0)))
    inn = F.sqrt(sum((i * i for i in ivec), F.lit(0.0)))
    return F.when((tn == 0.0) | (inn == 0.0), F.lit(0.0)).otherwise(dot / (tn * inn))


def curate_image_captions(
    images: DataFrame,
    *,
    id_col: str = "image_id",
    caption_col: str = "caption",
    min_dim: int = 64,
    max_aspect: float = 4.0,
    min_caption_words: int = 5,
    sim_threshold: float = 0.0,
) -> DataFrame:
    """LAION-style keep/drop decision per image+caption pair.

    Gates (each surfaced as its own flag so curation yields are
    auditable per rule, the way the LAION papers report them):
      size_ok    : w >= min_dim AND h >= min_dim
      aspect_ok  : max(w,h)/min(w,h) <= max_aspect
      caption_ok : caption token count >= min_caption_words
      sim_ok     : alignment >= sim_threshold
      keep       : all four

    Output: (image_id, w, h, fmt, n_caption_words, aspect, alignment,
    size_ok, aspect_ok, caption_ok, sim_ok, keep).

    100 TB shape: explode_outer(tokens) -> ONE hash aggregation keyed by
    image_id (15 conditional sums + first(w/h/fmt/phash) — all
    map-side combinable; empty captions keep their row via the outer
    explode) -> pure fixed-width column algebra.  ONE Exchange total,
    zero joins, zero Python."""
    toks = _lm_tokens(caption_col)
    staged = images.select(
        F.col(id_col),
        F.col("w"),
        F.col("h"),
        F.col("fmt"),
        F.col("phash"),
        F.explode_outer(toks).alias("_tok"),
    )
    dim, sign = caption_dim_sign(F.col("_tok"))
    # metadata columns ride in the GROUP KEY (functionally dependent on
    # image_id) rather than through first() aggregates: string agg
    # buffers force SortAggregate, group keys keep HashAggregate
    agg = staged.groupBy(id_col, "w", "h", "fmt", "phash").agg(
        F.count("_tok").cast("int").alias("n_caption_words"),
        *[
            F.coalesce(
                F.sum(F.when(dim == d, sign.cast("double"))), F.lit(0.0)
            ).alias(f"_t{d}")
            for d in range(DIMS)
        ],
    )
    tvec = [F.col(f"_t{d}") for d in range(DIMS)]
    ivec = image_vec_from_phash(F.col("phash"))
    aspect = F.greatest("w", "h").cast("double") / F.least("w", "h").cast("double")
    align = alignment_cos(tvec, ivec)
    out = agg.select(
        F.col(id_col),
        "w",
        "h",
        "fmt",
        "n_caption_words",
        F.round(aspect, 9).alias("aspect"),
        F.round(align, 9).alias("alignment"),
        (F.col("w") >= min_dim) & (F.col("h") >= min_dim),
        F.round(aspect, 9) <= float(max_aspect),
        F.col("n_caption_words") >= int(min_caption_words),
        F.round(align, 9) >= float(sim_threshold),
    )
    out = out.toDF(
        id_col,
        "w",
        "h",
        "fmt",
        "n_caption_words",
        "aspect",
        "alignment",
        "size_ok",
        "aspect_ok",
        "caption_ok",
        "sim_ok",
    )
    return out.withColumn(
        "keep",
        F.col("size_ok") & F.col("aspect_ok") & F.col("caption_ok") & F.col("sim_ok"),
    )
