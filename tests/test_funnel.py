"""Curation funnel composition (operators/curation.curation_funnel +
funnel_stats): first-failing-stage attribution, attrition chaining,
inline-Column fusion, plan shape.  Oracle parity at sf0.001 runs in
test_entry_oracle (entries curate_funnel / curate_funnel_stats)."""

from pyspark.sql import functions as F

from sosse_spark.operators.curation import curation_funnel, funnel_stats

STAGES = ["lang", "gopher", "c4", "fineweb"]

# (doc_id, lang, gopher, c4, fineweb) -> expected first_failed
CASES = [
    (1, True, True, True, True, "none"),
    (2, False, True, True, True, "lang"),
    (3, True, False, True, True, "gopher"),
    (4, True, True, False, True, "c4"),
    (5, True, True, True, False, "fineweb"),
    (6, False, False, False, False, "lang"),   # first failure wins
    (7, True, False, True, False, "gopher"),
    (8, False, True, False, True, "lang"),
]


def _verdicts(spark):
    df = spark.createDataFrame(
        [c[:5] for c in CASES],
        "doc_id long, v_lang boolean, v_gopher boolean, v_c4 boolean, v_fineweb boolean",
    )
    return curation_funnel(df, [(s, f"v_{s}") for s in STAGES])


def test_first_failed_attribution(spark):
    got = {r["doc_id"]: r for r in _verdicts(spark).collect()}
    for case in CASES:
        r = got[case[0]]
        assert r["first_failed"] == case[5], case
        assert r["keep"] == all(case[1:5]), case
        assert [r[f"s_{s}"] for s in STAGES] == list(case[1:5]), case


def test_funnel_stats_chaining(spark):
    stats = funnel_stats(_verdicts(spark), STAGES).collect()
    rows = {r["stage"]: r for r in stats}
    assert [r["stage"] for r in sorted(stats, key=lambda r: r["stage_no"])] == STAGES
    # 8 docs in; lang fails 3 (docs 2, 6, 8); gopher fails 2 of the
    # remaining 5 (docs 3, 7); c4 fails 1 of 3 (doc 4); fineweb fails
    # 1 of 2 (doc 5); 1 survivor
    assert (rows["lang"]["n_in"], rows["lang"]["n_failed"], rows["lang"]["n_out"]) == (8, 3, 5)
    assert (rows["gopher"]["n_in"], rows["gopher"]["n_failed"], rows["gopher"]["n_out"]) == (5, 2, 3)
    assert (rows["c4"]["n_in"], rows["c4"]["n_failed"], rows["c4"]["n_out"]) == (3, 1, 2)
    assert (rows["fineweb"]["n_in"], rows["fineweb"]["n_failed"], rows["fineweb"]["n_out"]) == (2, 1, 1)


def test_inline_column_stages_fuse_to_projection(spark):
    """Verdicts passed as inline Columns keep the funnel a pure
    projection — zero exchange, zero join (the 100 TB fused shape)."""
    df = spark.range(16).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    )
    out = curation_funnel(
        df,
        [
            ("len", F.length("text") > 1),
            ("vowel", F.col("text").rlike("[aeiou]")),
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_funnel_stats_single_aggregation_plan(spark):
    """funnel_stats is ONE global aggregation + a literal-array explode
    on the 1-row result: no window, no join, no per-stage pass."""
    root = funnel_stats(_verdicts(spark), STAGES)._jdf.queryExecution().executedPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    kinds = [n.getClass().getSimpleName() for n in walk(root)]
    assert not any("Window" in k or "Join" in k or "Cartesian" in k for k in kinds)
    n_aggs = sum(1 for k in kinds if "HashAggregate" in k or "SortAggregate" in k)
    # one partial + one final aggregate pair at most
    assert n_aggs <= 2, kinds
