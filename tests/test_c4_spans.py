"""C4 three-sentence-span corpus dedup (operators/dedup.c4_span_dedup):
hand-value arms — cross-doc removal, intra-doc repeat, short docs,
sentence-less docs, overlap behavior.  Oracle parity runs in
test_entry_oracle (entry dedup_c4_spans)."""

from sosse_spark.operators.dedup import c4_span_dedup

DOCS = [
    (1, "s one aa. s two bb. s three cc. tail unique x."),
    (2, "s one aa. s two bb. s three cc. tail unique y."),
    (3, "r a. r b. r c. r a. r b. r c."),
    (4, "only two. sentences here."),
    (5, "no punctuation at all"),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = c4_span_dedup(df)
    assert out.columns == [
        "_id", "text", "n_sentences", "kept_sentences", "removed_sentences",
    ]
    return {r["_id"]: r for r in out.collect()}


def test_cross_doc_removal(spark):
    got = _run(spark)
    # doc 1 is the corpus-first occurrence of the shared triple: intact
    assert got[1]["text"] == "s one aa. s two bb. s three cc. tail unique x."
    assert got[1]["removed_sentences"] == 0
    # doc 2's copy of the triple is removed; its unique tail survives.
    # Its OTHER span (two, three, tail-y) is unique — only the full
    # duplicate 3-span triggers removal
    assert got[2]["text"] == "tail unique y."
    assert got[2]["n_sentences"] == 4
    assert got[2]["kept_sentences"] == 1
    assert got[2]["removed_sentences"] == 3


def test_intra_doc_repeat(spark):
    got = _run(spark)
    # spans (a,b,c) at p=1 and p=4 collide; p=4 loses -> sentences 4-6 go
    assert got[3]["text"] == "r a. r b. r c."
    assert got[3]["removed_sentences"] == 3


def test_short_and_sentenceless_docs(spark):
    got = _run(spark)
    # < 3 sentences: no spans, untouched
    assert got[4]["text"] == "only two. sentences here."
    assert got[4]["removed_sentences"] == 0
    # no terminal punctuation: zero sentences, empty text, still a row
    assert got[5]["n_sentences"] == 0
    assert got[5]["text"] == ""
    assert got[5]["kept_sentences"] == 0


def test_determinism(spark):
    a = {(r["_id"], r["text"]) for r in _run(spark).values()}
    b = {(r["_id"], r["text"]) for r in _run(spark).values()}
    assert a == b
