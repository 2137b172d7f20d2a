"""Q1 websearch grammar: AND groups, `or`, negation, suffix folding
(websearch_to_tsquery semantics, se/search.py:104-119)."""

from pyspark.sql import functions as F

from sosse_spark.operators.fts import (
    WebsearchGroup,
    fold_suffix,
    fts_fold,
    fts_match_rank,
    fts_tokens,
    parse_websearch,
)


def test_parse_websearch_groups_and_negation():
    gs = parse_websearch('big data or -"slow path" stream -dup')
    assert len(gs) == 2
    assert gs[0].terms == ["big", "data"] and not gs[0].neg_terms
    assert gs[1].terms == ["stream"]
    assert gs[1].neg_terms == ["dup"]
    assert gs[1].neg_phrases == ["slow path"]


def test_parse_websearch_or_edge_cases():
    assert len(parse_websearch("or spark or or vector or")) == 2  # no empty groups
    assert parse_websearch('"the data"')[0].phrases == ["the data"]
    assert parse_websearch("") == []


def test_fold_suffix_python_matches_column(spark):
    words = ["sparks", "queries", "possesses", "glass", "is", "spark", "ss", "s"]
    df = spark.createDataFrame([(words,)], "w array<string>")
    col_folded = df.select(fts_fold(F.col("w")).alias("f")).collect()[0]["f"]
    assert col_folded == [fold_suffix(w) for w in words]
    assert fold_suffix("sparks") == "spark"
    assert fold_suffix("glass") == "glass"


def test_match_rank_or_negation_fold(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark joins the data"),
            (2, "vector search only"),
            (3, "spark with dup rows"),
            (4, "nothing relevant"),
            (5, "many sparks flying"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in fts_match_rank(docs, "spark or vector", text_col="text").collect()}
    assert got == {1, 2, 3, 5}  # OR matches either; 'sparks' folds to spark
    neg = {r.doc_id for r in fts_match_rank(docs, "sparks -dup", text_col="text").collect()}
    assert neg == {1, 5}  # query-side fold + negation
    phr = {r.doc_id for r in fts_match_rank(docs, '-vector "the data"', text_col="text").collect()}
    assert phr == {1}
    assert isinstance(parse_websearch("x")[0], WebsearchGroup)


def test_tokens_stay_jvm(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        fts_match_rank(docs, "a or b", text_col="text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    _ = fts_tokens  # re-exported building block


def test_index_and_scan_paths_agree(spark):
    """fts_build_index + fts_query_index must reproduce fts_match_rank's
    (doc, rank) sets exactly for term-only websearch queries."""
    from sosse_spark.operators.fts import fts_build_index, fts_match_rank, fts_query_index

    docs = spark.createDataFrame(
        [
            (1, "spark joins the data quickly"),
            (2, "vector search only here"),
            (3, "spark with dup rows and dup keys"),
            (4, "nothing relevant at all"),
            (5, "many sparks flying sparks everywhere"),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    idx = fts_build_index(docs, "doc_id").cache()
    for q in ["spark", "spark or vector", "sparks -dup", "dup keys", "-spark vector"]:
        scan = {(r["doc_id"], r["rank"]) for r in fts_match_rank(docs, q).collect()}
        via_idx = {(r["_id"], r["rank"]) for r in fts_query_index(idx, q).collect()}
        assert via_idx == scan, f"query {q!r}: {via_idx} != {scan}"
    idx.unpersist()


def test_index_rejects_phrases(spark):
    from sosse_spark.operators.fts import fts_build_index, fts_query_index

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    idx = fts_build_index(docs, "doc_id")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="phrase"):
        fts_query_index(idx, '"a b"')


def test_rank_order_embeds_position_and_subsumes_tf(spark):
    """fts_rank_order: pos is the 1-based position under
    (rank_lite desc, id asc); rank_lite is sub-linear per-term tf with
    no length normalization (ts_rank normalization=0 analog)."""
    from sosse_spark.operators.fts import fts_rank_order

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark is heavy on spark"),  # tf=4 → 4/5
            (2, "spark once and a lot of other words here now"),  # tf=1 → 1/2
            (3, "vector vector"),  # tf=2 → 2/3
            (4, "spark vector"),  # 1/2 + 1/2 = 1.0
            (5, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    got = fts_rank_order(docs, "spark or vector").collect()
    assert [(r["doc_id"], r["pos"]) for r in got] == [(4, 1), (1, 2), (3, 3), (2, 4)]
    by_id = {r["doc_id"]: r["rank_lite"] for r in got}
    assert by_id[4] == 1.0 and by_id[1] == 0.8 and abs(by_id[3] - 2 / 3) < 1e-6
    # a longer document with the same tf ranks EQUAL (no length
    # normalization — SearchRank default), tiebreak by id
    docs2 = spark.createDataFrame(
        [(1, "spark short"), (2, "spark " + "filler " * 50)],
        "doc_id long, text string",
    )
    got2 = fts_rank_order(docs2, "spark").collect()
    assert [(r["doc_id"], r["pos"]) for r in got2] == [(1, 1), (2, 2)]
    assert got2[0]["rank_lite"] == got2[1]["rank_lite"] == 0.5


def test_pg_rank_or_exact_values(spark):
    """pg_rank_or_col reproduces PG calc_rank_or exactly for unweighted
    docs: w*H2(tf)/zeta(2) per present term, mean over query items
    (tsrank.c) — values checked against a hand-computed table."""
    from sosse_spark.operators.fts import fts_rank_order_pg

    docs = spark.createDataFrame(
        [
            (1, "spark spark vector x"),
            (2, "vector only here"),
            (3, "nothing matches"),
            (4, "spark spark spark spark"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fts_rank_order_pg(docs, "spark or vector").collect()}
    assert set(rows) == {1, 2, 4}

    def h2(n):
        return sum(1.0 / (j * j) for j in range(1, n + 1))

    def rank(tfs):
        return round(sum(0.1 * h2(tf) / 1.64493406685 for tf in tfs) / 2.0, 6)

    assert rows[1]["rank_pg"] == rank([2, 1])
    assert rows[2]["rank_pg"] == rank([0, 1])
    assert rows[4]["rank_pg"] == rank([4, 0])
    # order embedded in pos: doc1 > doc4 > doc2
    assert (rows[1]["pos"], rows[4]["pos"], rows[2]["pos"]) == (1, 2, 3)


def test_pg_rank_and_root_proximity_exact(spark):
    """AND-rooted queries take PG's calc_rank_and arm: noisy-or over
    sqrt(w²·word_distance(dist)) position pairs (tsrank.c).  Values
    checked against a double-precision replication of the PG formula;
    proximity now orders like PG — adjacent terms beat distant ones."""
    import math

    from sosse_spark.operators.fts import fts_rank_order_pg

    far = "spark " + " ".join(f"w{i}" for i in range(20)) + " vector"
    docs = spark.createDataFrame(
        [(1, far), (2, "spark vector"), (3, "vector x spark y vector")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fts_rank_order_pg(docs, "spark vector").collect()}

    def wd(d):
        return 1e-30 if d > 100 else 1.0 / (1.005 + 0.05 * math.exp(d / 1.5 - 2.0))

    def rank(pos_spark, pos_vector):
        keep = 1.0
        for l in pos_vector:  # second query item OUTER (PG pair order)
            for q in pos_spark:
                keep *= 1.0 - math.sqrt(0.1 * 0.1 * wd(abs(l - q)))
        return round(1.0 - keep, 6)

    assert rows[1]["rank_pg"] == rank([1], [22])
    assert rows[2]["rank_pg"] == rank([1], [2])
    assert rows[3]["rank_pg"] == rank([3], [1, 5])
    # proximity ordering: the noisy-or ACCUMULATES pairs, so two
    # distance-2 pairs (doc3, rank ~.187) beat one adjacent pair
    # (doc2, ~.099), which beats the 21-apart pair (doc1) — exactly
    # PG's behavior
    assert (rows[3]["pos"], rows[2]["pos"], rows[1]["pos"]) == (1, 2, 3)
    # word_distance saturation: beyond distance 100 the pair contributes
    # ~nothing
    wide = "spark " + " ".join(f"w{i}" for i in range(120)) + " vector"
    docs2 = spark.createDataFrame([(1, wide)], "doc_id long, text string")
    (r1,) = fts_rank_order_pg(docs2, "spark vector").collect()
    assert r1["rank_pg"] == 0.0  # 1e-30-weighted pair rounds to zero


def _wd(d):
    import math

    return 1e-30 if d > 100 else 1.0 / (1.005 + 0.05 * math.exp(d / 1.5 - 2.0))


def _rank_and(dists):
    """Double-precision replication of PG calc_rank_and over an ordered
    pair-distance list (dist==0 pairs already skipped)."""
    import math

    if not dists:
        return round(1e-20, 6)
    keep = 1.0
    for d in dists:
        keep *= 1.0 - math.sqrt(0.1 * 0.1 * _wd(d))
    return round(1.0 - keep, 6)


def test_pg_rank_phrase_operand_items(spark):
    """A phrase operand inside an AND root ranks through its individual
    lexemes (tsrank.c ranks SortAndUniqItems, not the boolean tree):
    'index "spark vector"' -> items {index, spark, vector}, pairs in
    sorted-item order (spark,index), (vector,index), (vector,spark),
    l over the LATER item's positions outer."""
    from sosse_spark.operators.fts import fts_rank_order_pg

    docs = spark.createDataFrame(
        [
            (1, "index spark vector"),
            (2, "spark vector stuff index"),
            (3, "index vector spark"),  # no 'spark vector' substring
            (4, "spark vector"),  # no 'index'
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in fts_rank_order_pg(docs, 'index "spark vector"').collect()
    }
    assert set(rows) == {1, 2}
    # doc1: index@1 spark@2 vector@3 -> pairs |2-1|, |3-1|, |3-2|
    assert rows[1]["rank_pg"] == _rank_and([1, 2, 1])
    # doc2: spark@1 vector@2 index@4 -> |1-4|, |2-4|, |2-1|
    assert rows[2]["rank_pg"] == _rank_and([3, 2, 1])
    assert (rows[1]["pos"], rows[2]["pos"]) == (1, 2)


def test_pg_rank_negated_phrase_and_clamp(spark):
    """Negated lexemes are still rank items when present (a doc can
    match 'spark -"vector index"' while containing 'vector' and 'index'
    non-adjacently), and a doc with only one present item hits PG's
    1e-20 no-pair clamp regardless of term frequency."""
    from sosse_spark.operators.fts import fts_rank_order_pg

    docs = spark.createDataFrame(
        [
            (1, "spark x vector y index"),
            (2, "spark only spark spark"),
            (3, "spark vector index"),  # contains the negated phrase
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in fts_rank_order_pg(docs, 'spark -"vector index"').collect()
    }
    assert set(rows) == {1, 2}
    # doc1: spark@1 vector@3 index@5 -> pairs (spark,index)=|1-5|,
    # (vector,index)=|3-5|, (vector,spark)=|3-1|
    assert rows[1]["rank_pg"] == _rank_and([4, 2, 2])
    # doc2: only 'spark' present among {index, spark, vector} -> no
    # cross-item pair -> 1e-20 clamp -> rounds to 0.0, sorts last
    assert rows[2]["rank_pg"] == 0.0
    assert (rows[1]["pos"], rows[2]["pos"]) == (1, 2)


def test_pg_rank_or_root_includes_phrase_lexemes(spark):
    """OR-rooted queries rank via calc_rank_or over ALL items including
    phrase words: 'index OR "spark vector"' -> 3 items, mean divisor 3,
    each present lexeme contributing w*H2(tf)/zeta(2)."""
    from sosse_spark.operators.fts import fts_rank_order_pg

    docs = spark.createDataFrame(
        [(1, "spark vector z"), (2, "index z")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in fts_rank_order_pg(docs, 'index OR "spark vector"').collect()
    }
    assert set(rows) == {1, 2}
    one = 0.1 * 1.0 / 1.64493406685
    assert rows[1]["rank_pg"] == round(2 * one / 3.0, 6)
    assert rows[2]["rank_pg"] == round(one / 3.0, 6)


def test_pg_rank_floor_and_fallback(spark):
    """The reference excludes rank <= 0.01 results but falls back to
    ALL matches when the exclusion empties the set
    (se/search.py:115-118)."""
    from sosse_spark.operators.fts import fts_rank_order_pg

    near = "spark vector"
    far = "spark " + " ".join(f"w{i}" for i in range(120)) + " vector"
    docs = spark.createDataFrame(
        [(1, near), (2, far)], "doc_id long, text string"
    )
    got = fts_rank_order_pg(docs, "spark vector", rank_floor=0.01).collect()
    assert [r["doc_id"] for r in got] == [1]  # far pair ranks ~1e-16

    # fallback: every match under the floor -> keep them all
    docs2 = spark.createDataFrame([(2, far)], "doc_id long, text string")
    got2 = fts_rank_order_pg(docs2, "spark vector", rank_floor=0.01).collect()
    assert [r["doc_id"] for r in got2] == [2]


def test_fts_words_view(spark):
    """The /words archive view (se/words.py:26-33): one row per
    (doc, word) with 1-based positions comma-joined ascending — the
    tsvector text form the reference splits for display.  Folding
    applies before position assignment."""
    from sosse_spark.operators.fts import fts_words_view

    docs = spark.createDataFrame(
        [(1, "Tables table, batches batch"), (2, ""), (3, "x")],
        "doc_id long, text string",
    )
    rows = {(r["doc_id"], r["word"]): r["positions"] for r in fts_words_view(docs).collect()}
    # 'tables'/'table' fold together; 'batches' folds to 'batche'
    # ([^s])s$ strips one trailing s), 'batch' stays
    assert rows == {
        (1, "table"): "1,2",
        (1, "batche"): "3",
        (1, "batch"): "4",
        (3, "x"): "1",
    }


def test_fts_rank_order_pg_bounded(spark):
    from sosse_spark.operators.fts import fts_rank_order_pg

    docs = spark.createDataFrame(
        [(i, "spark " * (i % 5 + 1)) for i in range(50)], "doc_id long, text string"
    )
    out = fts_rank_order_pg(docs, "spark", max_results=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 7


def test_phrase_lexeme_mode_pg_exact(spark):
    """phrase_mode='lexeme' reproduces PG's <-> semantics: folded
    lexemes at consecutive positions — punctuation/casing between words
    is irrelevant, plural folding applies, substring overlap into a
    LONGER token does not match (PG: 'hashing' is a different lexeme
    than 'hash' under this engine's fold)."""
    from sosse_spark.operators.fts import fts_rank_order_pg

    docs = spark.createDataFrame(
        [
            (1, "index Tables, hash!"),     # lexeme-adjacent via fold+punct
            (2, "index table hashing"),      # substring 'table hash' yes, lexeme no
            (3, "index hash table"),         # reversed order: neither
            (4, "index table x hash"),       # gap: neither
            (5, "index table hash"),         # both
        ],
        "doc_id long, text string",
    )
    lex = {
        r["doc_id"]
        for r in fts_rank_order_pg(
            docs, 'index "table hash"', phrase_mode="lexeme"
        ).collect()
    }
    sub = {
        r["doc_id"]
        for r in fts_rank_order_pg(docs, 'index "table hash"').collect()
    }
    assert lex == {1, 5}
    assert sub == {2, 5}

    # negated phrase under lexeme mode: doc2 no longer excluded (its
    # lexemes are not adjacent), doc1 now IS excluded
    neg = {
        r["doc_id"]
        for r in fts_rank_order_pg(
            docs, 'index -"table hash"', phrase_mode="lexeme"
        ).collect()
    }
    assert neg == {2, 3, 4}


def test_phrase_lexeme_edge_cases(spark):
    """Single-word and longer-than-doc phrases; empty phrase matches
    all (PG's empty tsquery arm)."""
    from sosse_spark.operators.fts import fts_rank_order_pg

    docs = spark.createDataFrame(
        [(1, "spark"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]
        for r in fts_rank_order_pg(docs, '"sparks"', phrase_mode="lexeme").collect()
    }
    assert got == {1}  # single-word phrase folds and matches
    got3 = {
        r["doc_id"]
        for r in fts_rank_order_pg(docs, '"a b c"', phrase_mode="lexeme").collect()
    }
    assert got3 == set()  # phrase longer than every doc

    import pytest as _pytest

    with _pytest.raises(ValueError, match="phrase_mode"):
        fts_rank_order_pg(docs, '"a"', phrase_mode="bogus")
