"""Seeded fuzz differential for script_profile: random texts drawn
from a pool of codepoints sitting EXACTLY at the script-block edges
(first/last codepoint of every range plus its outside neighbours) vs a
literal pure-Python replication of the rule.  Catches block-boundary
off-by-ones that hand-picked goldens miss.  Same house style as the
c4-span / search_redirect fuzz sweeps.

Rounding: Spark F.round(double, 6) is HALF_UP over the double's
shortest decimal repr (BigDecimal.valueOf), so the replication uses
Decimal(repr(cnt / n)) with ROUND_HALF_UP — Python's builtin round is
banker's and diverges on exact 7th-digit ties (CLAUDE.md rule).
"""

import random
from decimal import ROUND_HALF_UP, Decimal

from sosse_spark.functions.text import script_profile

# mirrors _SCRIPT_BLOCKS in functions/text.py (priority order matters:
# argmax ties break toward the earlier block)
_BLOCKS = [
    ("latin", [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)]),
    ("cyrillic", [(0x400, 0x4FF)]),
    ("greek", [(0x370, 0x3FF)]),
    ("cjk", [(0x4E00, 0x9FFF), (0x3040, 0x30FF)]),
    ("arabic", [(0x600, 0x6FF)]),
    ("hangul", [(0xAC00, 0xD7AF), (0x1100, 0x11FF)]),
]
_DIGIT = [(0x30, 0x39)]

# every range edge, its outside neighbours, and a few no-block chars —
# all BMP, no surrogates (the operator's declared domain)
_EDGE_POOL = [
    0x40, 0x41, 0x5A, 0x5B, 0x60, 0x61, 0x7A, 0x7B,  # A-Z / a-z seams
    0x2F, 0x30, 0x39, 0x3A,                          # digit seams
    0xBF, 0xC0, 0x24F, 0x250,                        # Latin-1/Extended
    0x36F, 0x370, 0x3FF, 0x400, 0x4FF, 0x500,        # greek|cyrillic seam
    0x5FF, 0x600, 0x6FF, 0x700,                      # arabic
    0x10FF, 0x1100, 0x11FF, 0x1200,                  # hangul jamo
    0x303F, 0x3040, 0x30FF, 0x3100,                  # kana
    0x4DFF, 0x4E00, 0x9FFF, 0xA000,                  # CJK unified
    0xABFF, 0xAC00, 0xD7AF, 0xD7B0,                  # hangul syllables
    0x20, 0x2E,                                      # space / dot (no block)
]


def _count(text: str, ranges) -> int:
    return sum(1 for ch in text if any(lo <= ord(ch) <= hi for lo, hi in ranges))


def _frac(cnt: int, n: int) -> float:
    if n <= 0:
        return 0.0
    d = Decimal(repr(cnt / n)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    return float(d)


def _python_rule(docs):
    out = {}
    for i, text in docs:
        n = len(text)
        counts = [_count(text, rngs) for _, rngs in _BLOCKS]
        mx = max(counts)
        script = _BLOCKS[counts.index(mx)][0] if mx > 0 else "other"
        row = [n] + [_frac(c, n) for c in counts]
        row.append(_frac(_count(text, _DIGIT), n))
        row.append(script)
        out[i] = tuple(row)
    return out


def _corpus(seed: int, n_docs: int = 60):
    rng = random.Random(seed)
    docs = [(0, "")]  # empty-text arm: all fractions 0.0, script 'other'
    for i in range(1, n_docs):
        n = rng.randint(1, 30)
        docs.append((i, "".join(chr(rng.choice(_EDGE_POOL)) for _ in range(n))))
    return docs


def test_fuzz_matches_python_replication(spark):
    for seed in (7, 19, 31):
        docs = _corpus(seed)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_chars"],
                r["latin_frac"],
                r["cyrillic_frac"],
                r["greek_frac"],
                r["cjk_frac"],
                r["arabic_frac"],
                r["hangul_frac"],
                r["digit_frac"],
                r["script"],
            )
            for r in script_profile(df).collect()
        }
        want = _python_rule(docs)
        assert got == want, f"seed {seed}"


def test_single_edge_codepoints_classify_exactly(spark):
    # one doc per pool codepoint: the dominant script IS the block
    # membership of that single char (or 'other'), fraction 1.0 or 0.0
    docs = [(cp, chr(cp)) for cp in _EDGE_POOL]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in script_profile(df).collect()}
    for cp in _EDGE_POOL:
        member = [nm for nm, rngs in _BLOCKS if _count(chr(cp), rngs)]
        r = rows[cp]
        assert r["n_chars"] == 1
        assert r["script"] == (member[0] if member else "other"), hex(cp)
        for nm, _ in _BLOCKS:
            assert r[f"{nm}_frac"] == (1.0 if member[:1] == [nm] else 0.0), hex(cp)
