"""Q1: full-text match + rank — the websearch approximation.

The reference ranks with PostgreSQL tsvector + SearchRank
(se/search.py:104-119, websearch_to_tsquery semantics; tests
se/test_search.py:110-155).  There is no GIN/tsvector in Spark; the
SURVEY-sketched approximable form is token-overlap scoring with pure
column algebra (array ops, codegen'd — no UDF):

  * tokens   = non-empty [a-z0-9]+ runs of lower(text)
  * websearch AND: a document matches iff EVERY unquoted query term is
    present in its token set, and every "quoted phrase" is a substring
    of lower(text)
  * rank     = (occurrences of any query term) / (total tokens) — a
    TF-style score, deterministic and oracle-expressible
  * rows with rank <= rank_floor are dropped (reference drops
    rank <= 0.01 unless the result would be empty)

Scale shape: one projection + filter over the corpus — no shuffle, no
join; the tokenization is a single split per row inside WholeStageCodegen.
An inverted-index variant (explode → token table) is the right layout
when the same corpus serves many queries; this operator is the
scan-per-query form.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_websearch", "fts_tokens", "fts_match_rank"]


def parse_websearch(query: str) -> tuple[list[str], list[str]]:
    """→ (terms, phrases): '"quoted phrases"' out, remaining words AND'd
    (websearch_to_tsquery's default operator is AND)."""
    phrases = [p.strip().lower() for p in re.findall(r'"([^"]+)"', query) if p.strip()]
    rest = re.sub(r'"[^"]*"', " ", query)
    terms = [t for t in re.split(r"[^a-zA-Z0-9]+", rest.lower()) if t]
    return terms, phrases


def fts_tokens(text_col: Column) -> Column:
    """Lowercased alnum token array (the tsvector-lexeme analog, minus
    stemming)."""
    return F.filter(
        F.split(F.lower(text_col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def fts_match_rank(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    rank_floor: float = 0.01,
) -> DataFrame:
    """Append `rank` and keep matching rows (Q1).  Output: input columns
    + rank (double, rounded 6), rank > rank_floor, AND-match semantics.
    """
    terms, phrases = parse_websearch(query)
    toks = fts_tokens(F.col(text_col))
    cond = F.lit(True)
    for t in terms:
        cond = cond & F.array_contains(toks, t)
    for p in phrases:
        cond = cond & F.lower(F.col(text_col)).contains(p)
    if terms:
        term_arr = F.array(*[F.lit(t) for t in terms])
        matched = F.size(F.filter(toks, lambda x: F.array_contains(term_arr, x)))
    else:
        matched = F.size(toks)  # phrase-only query: every token "matches"
    rank = F.round(matched / F.greatest(F.size(toks), F.lit(1)), 6)
    return docs.filter(cond).withColumn("rank", rank).filter(F.col("rank") > rank_floor)
