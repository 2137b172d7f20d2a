"""Unicode script profiling (functions/text.script_profile): hand-value
fractions, dominance, priority tie-break, empty/other arms.  Oracle
parity at sf0.001 runs in test_entry_oracle (entry text_script)."""

from sosse_spark.functions.text import script_profile

DOCS = [
    (1, "hello world"),                     # pure latin
    (2, "привет мир"),                      # pure cyrillic (9 letters, 1 space)
    (3, "abc 中文中文中文"),                  # cjk 6 > latin 3 -> cjk
    (4, "abc где"),                          # latin 3 == cyrillic 3 -> tie: latin (priority)
    (5, "1234 5678"),                        # digits only -> no block -> other
    (6, ""),                                 # empty text
    (7, "καλημέρα κόσμε"),                   # greek
    (8, "مرحبا"),                            # arabic
    (9, "안녕하세요"),                         # hangul
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = script_profile(df)
    return {r["doc_id"]: r for r in out.collect()}


def test_dominant_script(spark):
    got = _run(spark)
    assert got[1]["script"] == "latin"
    assert got[2]["script"] == "cyrillic"
    assert got[3]["script"] == "cjk"
    assert got[7]["script"] == "greek"
    assert got[8]["script"] == "arabic"
    assert got[9]["script"] == "hangul"


def test_tie_breaks_to_priority_order(spark):
    got = _run(spark)
    # 3 latin letters vs 3 cyrillic letters: first max wins -> latin
    assert got[4]["script"] == "latin"


def test_fractions(spark):
    got = _run(spark)
    r = got[2]  # "привет мир": 10 chars, 9 cyrillic
    assert r["n_chars"] == 10
    assert abs(r["cyrillic_frac"] - 0.9) < 1e-9
    assert r["latin_frac"] == 0.0
    d = got[5]  # "1234 5678": 9 chars, 8 digits, no script block
    assert d["script"] == "other"
    assert abs(d["digit_frac"] - round(8 / 9, 6)) < 1e-9


def test_empty_text(spark):
    got = _run(spark)
    r = got[6]
    assert r["n_chars"] == 0
    assert r["script"] == "other"
    assert r["latin_frac"] == 0.0 and r["digit_frac"] == 0.0
