"""Differential fuzz for the final round-5 session's text ops:
corpus_line_dedup vs a literal pure-Python replica of the RefinedWeb
rule, and char_entropy vs a Counter-based Shannon entropy.  Seeded
random corpora (small alphabets force line collisions and skewed char
histograms) — the same sweep style as test_c4_spans_fuzz."""

import math
import random
from collections import Counter


def _py_line_dedup(docs, min_count=3, drop_char_ratio=0.5):
    """Literal replica: count non-blank lines corpus-wide, remove every
    occurrence of lines with count >= min_count, reassemble, flag docs
    losing > drop_char_ratio of their non-blank line chars."""
    lines = {}
    for _id, text in docs:
        for ln in text.split("\n"):
            if ln.strip(" "):  # Spark/DuckDB trim is space-only
                lines[ln] = lines.get(ln, 0) + 1
    out = {}
    for _id, text in docs:
        kept, removed, rm_chars, tot_chars = [], 0, 0, 0
        for ln in text.split("\n"):
            if not ln.strip(" "):
                continue
            tot_chars += len(ln)
            if lines[ln] >= min_count:
                removed += 1
                rm_chars += len(ln)
            else:
                kept.append(ln)
        dropped = tot_chars > 0 and rm_chars > tot_chars * drop_char_ratio
        out[_id] = ("\n".join(kept), len(kept), removed, dropped)
    return out


def test_corpus_line_dedup_fuzz_vs_replica(spark):
    from sosse_spark.operators.dedup import corpus_line_dedup

    rng = random.Random(1234)
    words = ["nav", "home", "buy now", "cookie banner", "x", "yz", "long line here"]
    for trial in range(6):
        docs = []
        for i in range(rng.randint(5, 25)):
            n_lines = rng.randint(0, 6)
            text = "\n".join(
                rng.choice(words + [f"unique {i} {j}", "  ", ""])
                for j in range(n_lines)
            )
            docs.append((i, text))
        sdf = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["_id"]: (r["text"], r["kept_lines"], r["removed_lines"], r["dropped"])
            for r in corpus_line_dedup(sdf, "doc_id", "text").collect()
        }
        want = _py_line_dedup(docs)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_char_entropy_fuzz_vs_counter(spark):
    from sosse_spark.functions.text import char_entropy

    rng = random.Random(99)
    alphabet = "abcdef ,.\n"
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 400))))
        for i in range(30)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["_id"]: r for r in char_entropy(sdf, "doc_id", "text", prefix=256).collect()}
    for i, text in docs:
        prefix = text[:256]
        c = Counter(prefix)
        n = sum(c.values())
        h = -sum(v / n * math.log2(v / n) for v in c.values()) if n else 0.0
        assert got[i]["n_chars"] == n
        # Spark rounds to 6; compare against the unrounded replica with
        # half-ulp slack so boundary ties can't flake
        assert abs(got[i]["entropy"] - h) <= 5.1e-7, (i, got[i]["entropy"], h)
