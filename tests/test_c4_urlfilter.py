"""C4 cleaning rules (Raffel et al. 2020 §2.2) and RefinedWeb/datatrove
URL quality filtering: hand-golden value tests for every rule arm plus
zero-shuffle plan checks (both ops are single-pass projections)."""

from pyspark.sql import functions as F

from sosse_spark.functions.text import c4_clean
from sosse_spark.operators.urlfilter import url_quality_filter


def _rows(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_c4_line_rules(spark):
    docs = spark.createDataFrame(
        [
            # all three lines survive -> 3 sentences -> kept
            (0, "alpha beta gamma delta epsilon one.\nzeta eta theta iota kappa two!\nlam mu nu xi omicron three?"),
            # short line + no-terminal line dropped; only 2 sentences -> page dropped
            (1, "alpha beta gamma delta epsilon one.\ntoo short.\nzeta eta theta iota kappa\nlam mu nu xi omicron three?"),
            # javascript line dropped despite punctuation + length
            (2, "alpha beta gamma delta epsilon one.\nplease enable JavaScript support to proceed.\nzeta eta theta iota kappa two!\nlam mu nu xi omicron three?"),
            # end-quote counts as terminal for the KEEP rule but not as a sentence mark
            (3, 'alpha beta gamma delta epsilon "one"\nzeta eta theta iota kappa two!\nlam mu nu xi omicron three?\nfinal words here make four.'),
        ],
        "doc_id int, text string",
    )
    got = _rows(c4_clean(docs))
    assert got[0]["n_kept"] == 3 and got[0]["n_sentences"] == 3 and got[0]["keep"]
    assert got[0]["text_clean"].count("\n") == 2

    assert got[1]["n_lines"] == 4 and got[1]["n_kept"] == 2
    assert got[1]["n_sentences"] == 2 and not got[1]["keep"]

    assert got[2]["n_kept"] == 3 and "JavaScript" not in got[2]["text_clean"]
    assert got[2]["keep"]

    # doc 3: quote-terminated line kept (4 kept lines) but contributes no
    # [.!?] sentence mark -> 3 sentences, still kept
    assert got[3]["n_kept"] == 4 and got[3]["n_sentences"] == 3 and got[3]["keep"]


def test_c4_page_rules(spark):
    base = "alpha beta gamma delta epsilon one.\nzeta eta theta iota kappa two!\nlam mu nu xi omicron three?"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + "\nthis page shows Lorem Ipsum filler today ok."),
            (2, base + "\nvar config = { enabled: true };"),
            (3, base + "\nthis line contains frak badness today ok."),
            # badword must match on word boundary: "frakking" is NOT "frak"
            (4, base + "\nthis line contains frakking badness today ok."),
        ],
        "doc_id int, text string",
    )
    got = _rows(c4_clean(docs, badwords=("frak", "gorram")))
    assert got[0]["keep"]
    assert got[1]["has_lorem"] and not got[1]["keep"]
    assert got[2]["has_brace"] and not got[2]["keep"]
    assert got[3]["has_badword"] and not got[3]["keep"]
    assert not got[4]["has_badword"] and got[4]["keep"]
    # the lorem line itself passes the LINE rules (punct + 5 words) so it
    # still lands in text_clean; the PAGE flag is what drops the doc
    assert "lorem ipsum" in got[1]["text_clean"].lower()


def test_c4_empty_and_blank(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "\n\n  \n"), (2, "word.")],
        "doc_id int, text string",
    )
    got = _rows(c4_clean(docs))
    for i in range(3):
        assert got[i]["n_kept"] == 0 and got[i]["n_sentences"] == 0
        assert got[i]["text_clean"] == "" and not got[i]["keep"]
    assert got[1]["n_lines"] == 0  # blank-only lines are not lines


def test_c4_zero_shuffle_plan(spark):
    docs = spark.createDataFrame(
        [(0, "x")], "doc_id int, text string"
    ).select("doc_id", F.concat(F.col("text"), F.lit(" more words here.")).alias("text"))
    plan = c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_filter_arms(spark):
    docs = spark.createDataFrame(
        [
            (0, "https://ok.example.com/articles/cooking-tips"),
            (1, "https://cdn.badhost.net/img/1.jpg"),          # parent-domain block
            (2, "https://badhost.net/index.html"),              # exact-domain block
            (3, "https://notbadhost.net/index.html"),           # label-aligned: NOT blocked
            (4, "https://ok.example.com/xxxstream/video7"),     # hard substring
            (5, "https://ok.example.com/casino-review"),        # 1 soft word < 2 -> kept
            (6, "https://ok.example.com/casino/poker-night"),   # 2 soft words -> blocked
            (7, "https://ok.example.com/pokerandcasino"),       # soft words need word split
            (8, "HTTPS://OK.EXAMPLE.COM/CASINO/POKER"),         # case-insensitive
        ],
        "doc_id int, url string",
    )
    got = _rows(
        url_quality_filter(
            docs,
            blocked_domains=("badhost.net",),
            hard_words=("xxxstream",),
            soft_words=("casino", "poker", "bet"),
            soft_threshold=2,
        )
    )
    assert got[0]["keep"] and got[0]["host"] == "ok.example.com"
    assert got[1]["domain_blocked"] and not got[1]["keep"]
    assert got[2]["domain_blocked"] and not got[2]["keep"]
    assert not got[3]["domain_blocked"] and got[3]["keep"]
    assert got[4]["hard_hit"] and not got[4]["keep"]
    assert got[5]["soft_count"] == 1 and got[5]["keep"]
    assert got[6]["soft_count"] == 2 and not got[6]["keep"]
    assert got[7]["soft_count"] == 0 and got[7]["keep"]
    assert got[8]["soft_count"] == 2 and not got[8]["keep"]


def test_url_filter_duplicate_soft_words_count_once(spark):
    docs = spark.createDataFrame(
        [(0, "https://x.org/casino/casino/casino")], "doc_id int, url string"
    )
    got = _rows(url_quality_filter(docs, soft_words=("casino", "poker")))
    assert got[0]["soft_count"] == 1 and got[0]["keep"]


def test_url_filter_no_rules_keeps_everything(spark):
    docs = spark.createDataFrame(
        [(0, "https://anything.example/casino")], "doc_id int, url string"
    )
    got = _rows(url_quality_filter(docs))
    assert got[0]["keep"] and not got[0]["domain_blocked"] and not got[0]["hard_hit"]
    assert got[0]["soft_count"] == 0


def test_url_filter_zero_shuffle_plan(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id int, url string").select(
        "doc_id", F.concat(F.lit("https://h.example.com/"), F.col("url")).alias("url")
    )
    out = url_quality_filter(
        docs,
        blocked_domains=("badhost.net",),
        hard_words=("xxxstream",),
        soft_words=("casino", "poker"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fineweb_quality_hand_values(spark):
    from sosse_spark.functions.text import fineweb_quality

    long_a = "alpha beta gamma delta epsilon zeta letters."
    long_b = "one two three four five six seven eight nine!"
    long_c = "red orange yellow green blue indigo violet done?"
    docs = spark.createDataFrame(
        [
            # 3 long punctuated lines + 1 short unpunctuated:
            # punct 3/4, short 1/4, dup 0 -> keep
            (0, f"{long_a}\n{long_b}\n{long_c}\nshort one"),
            # no punctuation anywhere -> punct 0 <= 0.12 -> dropped
            (1, "alpha beta gamma delta epsilon zeta\none two three four five six seven"),
            # line duplicated: dup chars = len(dup occurrences beyond first)
            # over total -> 44/132 = 0.333 >= 0.1 -> dropped
            (2, f"{long_a}\n{long_a}\n{long_a}"),
            # mostly short lines: 3/4 = 0.75 >= 0.67 -> dropped
            (3, f"{long_a}\nab.\ncd.\nef."),
            (4, ""),  # no lines: punct frac 0 -> dropped
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in fineweb_quality(docs).collect()}
    assert got[0]["keep"] and got[0]["punct_line_frac"] == 0.75
    assert got[0]["short_line_frac"] == 0.25 and got[0]["dup_line_char_frac"] == 0.0
    assert not got[1]["r_punct"] and not got[1]["keep"]
    assert got[2]["punct_line_frac"] == 1.0
    assert abs(got[2]["dup_line_char_frac"] - round(2 * 44 / 132, 6)) < 1e-12
    assert not got[2]["r_dup_char"] and not got[2]["keep"]
    assert got[3]["short_line_frac"] == 0.75 and not got[3]["r_short"] and not got[3]["keep"]
    assert got[4]["n_lines"] == 0 and not got[4]["keep"]


def test_fineweb_zero_shuffle_plan(spark):
    from sosse_spark.functions.text import fineweb_quality

    docs = spark.createDataFrame([(0, "x")], "doc_id int, text string").select(
        "doc_id", F.concat(F.col("text"), F.lit(" words here.")).alias("text")
    )
    plan = fineweb_quality(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
