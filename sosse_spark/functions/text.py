"""Text-analysis kernels for the training-data pipeline + reference parity.

Reference parity:
  * accent strip / NFD normalization — remove_accent (se/document.py:63-66)
    producing normalized_title/content/url
  * language detect — Document._get_lang (se/document.py:250-261); the
    reference uses langdetect (seeded).  We implement a deterministic
    stopword/character n-gram heuristic instead (no external model).

Training-data additions (per build brief): quality scoring, token
counting, rolling-hash document fingerprinting.  All built-in column
algebra where possible; NFD strip is a pandas UDF (Spark has no builtin
Unicode-decomposition strip).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = [
    "remove_accents",
    "remove_accents_udf",
    "lang_id_expr",
    "quality_score_expr",
    "token_count_expr",
    "bpe_ish_token_count_expr",
    "fingerprint_expr",
]

# Tiny deterministic stopword lists for the lang-ID heuristic.  Scoring is
# pure column algebra: count of language-marker words per language, argmax.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "es": ["el", "los", "las", "y", "es", "una", "que", "por"],
}


def _strip_series(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None:
            return None
        return "".join(c for c in unicodedata.normalize("NFD", v) if not unicodedata.combining(c))

    return s.map(one)


remove_accents_udf = F.pandas_udf(_strip_series, StringType())


def remove_accents(text: str) -> str:
    """Scalar NFD accent strip (parity: se/document.py:63-66)."""
    return "".join(c for c in unicodedata.normalize("NFD", text) if not unicodedata.combining(c))


def _marker_count(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(tokens, arr))


def lang_id_expr(text_col: Column) -> Column:
    """Deterministic n-gram/stopword language-ID heuristic.

    Counts distinct language-marker stopwords per language over the
    lowercased token set; highest count wins, ties broken by fixed
    language order; zero markers → 'und' (undetermined).
    """
    toks = F.split(F.lower(text_col), r"[^\p{L}]+")
    scores = [(lang, _marker_count(toks, words)) for lang, words in _LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # reversed so earlier languages win ties via later when() precedence
    for lang, score in reversed(scores):
        result = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def quality_score_expr(text_col: Column) -> Column:
    """Heuristic document-quality score in [0,1]: blend of length,
    alpha ratio, punctuation ratio, and mean word length sanity."""
    n = F.length(text_col).cast("double")
    alpha = F.length(F.regexp_replace(text_col, r"[^\p{L}]", "")).cast("double")
    punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?]", "")).cast("double")
    words = F.size(F.split(F.trim(text_col), r"\s+")).cast("double")
    mean_wlen = F.when(words > 0, n / words).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_score = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_penalty = F.when(n > 0, F.least(punct / n * 10.0, F.lit(1.0))).otherwise(F.lit(0.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        0.4 * len_score + 0.4 * alpha_score + 0.2 * wlen_score - 0.2 * punct_penalty, 6
    )


def token_count_expr(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(text_col)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text_col), r"\s+"))
    )


def bpe_ish_token_count_expr(text_col: Column) -> Column:
    """BPE-ish token estimate: count of word/number/punct fragments via a
    GPT-2-style pre-tokenizer regex (letters runs, digit runs, other)."""
    toks = F.regexp_extract_all(text_col, F.lit(r"(\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+)"), 1)
    return F.size(toks)


def fingerprint_expr(text_field: str, window: int = 8) -> Column:
    """Rolling-hash document fingerprint: lexicographic-min md5 over
    character shingles of `window` chars (winnowing-style min-sample,
    stable under small edits elsewhere in the document).  md5 rather than
    xxhash64 so a DuckDB oracle computes the identical value."""
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({text_field}) - {window - 1}, 1)), "
        f"i -> md5(substring({text_field}, i, {window}))))"
    )
