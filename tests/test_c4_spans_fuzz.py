"""Seeded fuzz differential for c4_span_dedup: random collision-heavy
corpora vs a literal pure-Python replication of the rule (sentences =
trimmed [^.!?]+[.!?] matches; every 3-span occurrence beyond the
corpus-first (id, pos) removes its sentences; docs reassemble in
order).  Same house style as the search_redirect / substring-dedup
fuzz sweeps."""

import random
import re

from sosse_spark.operators.dedup import c4_span_dedup

_SENT_POOL = [
    "alpha beta gamma.",
    "delta epsilon zeta!",
    "eta theta iota?",
    "kappa lambda mu.",
    "nu xi omicron.",
    "pi rho sigma!",
]


def _corpus(seed: int, n_docs: int = 40):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        n = rng.randint(0, 8)
        parts = []
        for _ in range(n):
            if rng.random() < 0.7:
                parts.append(rng.choice(_SENT_POOL))
            else:
                # unique sentence; sometimes no terminal punctuation
                tail = "." if rng.random() < 0.8 else ""
                parts.append(f"unique {i} {rng.randint(0, 999)}{tail}")
        # junk whitespace between sentences exercises the trim rule
        docs.append((i, (" " * rng.randint(0, 2)).join(parts)))
    return docs


def _python_rule(docs):
    sents = {
        i: [m.strip() for m in re.findall(r"[^.!?]+[.!?]", text)]
        for i, text in docs
    }
    spans = []  # (hash-key, id, pos) in corpus order
    for i, _ in docs:
        l = sents[i]
        for p in range(1, len(l) - 1):  # 1-based span positions 1..n-2
            spans.append((" ".join(l[p - 1 : p + 2]), i, p))
    seen = {}
    removed = set()
    for key, i, p in sorted(spans, key=lambda t: (t[0], t[1], t[2])):
        if key in seen:
            removed.update({(i, p), (i, p + 1), (i, p + 2)})
        else:
            seen[key] = (i, p)
    out = {}
    for i, _ in docs:
        l = sents[i]
        kept = [s for j, s in enumerate(l, start=1) if (i, j) not in removed]
        out[i] = (" ".join(kept), len(l), len(kept), len(l) - len(kept))
    return out


def test_fuzz_matches_python_replication(spark):
    for seed in (11, 23, 47):
        docs = _corpus(seed)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["_id"]: (
                r["text"],
                r["n_sentences"],
                r["kept_sentences"],
                r["removed_sentences"],
            )
            for r in c4_span_dedup(df).collect()
        }
        want = _python_rule(docs)
        assert got == want, f"seed {seed}"
