"""robots.txt parse + longest-match eval parity (se/domain.py:107-228)."""

from pyspark.sql import functions as F

from sosse_spark.operators.robots import evaluate_robots, parse_robots, robots_rules_rows

BODY = """# comment line
User-agent: megabot
Disallow: /mega

User-agent: sosse-spark
Disallow: /private*
Allow: /private/ok$

User-agent: *
Dissallow: /generic
"""


def test_parse_selects_own_ua_section():
    rules = parse_robots(BODY, user_agent="sosse-spark/0.1")
    assert ("disallow", "/private.*") in rules
    assert ("allow", "/private/ok$") in rules
    assert all("generic" not in p for _, p in rules)
    assert all("mega" not in p for _, p in rules)


def test_parse_falls_back_to_star_with_typo_key():
    rules = parse_robots(BODY, user_agent="otherbot/1.0")
    assert rules == [("disallow", "/generic")]


def test_parse_wildcard_and_anchor():
    rules = parse_robots("User-agent: *\nDisallow: /a*b$\n", "x")
    assert rules == [("disallow", "/a.*b$")]


def test_parse_empty_and_comments():
    assert parse_robots("# nothing\n\nfoo\n", "x") == []


def test_rules_rows_status():
    rows = robots_rules_rows("h.example.com", None)
    assert rows == [
        {"domain": "h.example.com", "kind": "status", "pattern": "empty", "pattern_len": 0}
    ]
    rows = robots_rules_rows("h.example.com", BODY, user_agent="sosse-spark/0.1")
    assert rows[0]["kind"] == "status" and rows[0]["pattern"] == "loaded"
    assert len(rows) == 3


def test_evaluate_longest_match(spark):
    """Longest disallow loses only to a STRICTLY longer allow
    (se/domain.py:193-228)."""
    rules = spark.createDataFrame(
        robots_rules_rows("h0", "User-agent: *\nDisallow: /private*\nAllow: /private/ok$\n", "x")
        + robots_rules_rows("h1", None),
        "domain string, kind string, pattern string, pattern_len int",
    )
    batch = spark.createDataFrame(
        [
            ("u1", "h0", "/public/x"),
            ("u2", "h0", "/private/secret"),
            ("u3", "h0", "/private/ok"),
            ("u4", "h1", "/private/anything"),
        ],
        "url string, url_domain string, url_path string",
    )
    got = {r["url"]: r["robots_authorized"] for r in evaluate_robots(batch, rules).collect()}
    assert got == {"u1": True, "u2": False, "u3": True, "u4": True}


def test_evaluate_equal_length_allow_loses(spark):
    rules = spark.createDataFrame(
        robots_rules_rows("h0", "User-agent: *\nDisallow: /abc\nAllow: /abc\n", "x"),
        "domain string, kind string, pattern string, pattern_len int",
    )
    batch = spark.createDataFrame([("u", "h0", "/abcdef")], "url string, url_domain string, url_path string")
    assert evaluate_robots(batch, rules).collect()[0]["robots_authorized"] is False


def test_bare_disallow_is_allow_all():
    """A bare 'Disallow:' (empty value) is the standard allow-all idiom —
    it must NOT become an empty regex that matches every path and denies
    the whole host (reference skips empty patterns, se/domain.py:208-210)."""
    from sosse_spark.operators.robots import parse_robots

    rules = parse_robots("User-agent: *\nDisallow:\n")
    assert rules == []
    rules2 = parse_robots("User-agent: *\nDisallow:\nDisallow: /private\nAllow:\n")
    assert rules2 == [("disallow", "/private")]


def test_bare_disallow_eval_authorizes(spark):
    from sosse_spark.operators.robots import evaluate_robots, robots_rules_rows

    rows = robots_rules_rows("h0", "User-agent: *\nDisallow:\n")
    rules = spark.createDataFrame(rows, "domain string, kind string, pattern string, pattern_len int")
    batch = spark.createDataFrame([("u1", "h0", "/anything")], "url string, url_domain string, url_path string")
    got = evaluate_robots(batch, rules).collect()[0]
    assert got["robots_authorized"] is True


def test_literal_prefix_rules_match_without_regex_semantics(spark):
    """Literal rules (no wildcard/anchor) take the startswith fast path;
    regex metacharacters in the robots value must still match literally,
    and wildcard/anchor rules keep full regex behavior alongside."""
    from sosse_spark.operators.robots import evaluate_robots, robots_rules_rows

    content = (
        "User-agent: *\n"
        "Disallow: /a+b\n"          # literal '+' — not one-or-more
        "Disallow: /dot.dir\n"      # literal '.' — not any-char
        "Disallow: /wild*cat\n"     # wildcard → regex path
        "Disallow: /end$\n"         # anchored → regex path
        "Allow: /a+b/ok\n"          # longer literal allow wins
    )
    rules = spark.createDataFrame(
        robots_rules_rows("h0", content),
        "domain string, kind string, pattern string, pattern_len int",
    )
    cases = {
        "/a+b/x": False,        # literal prefix disallow
        "/aab": True,           # would be denied if '+' were regex
        "/a+b/ok/deep": True,   # longer allow beats disallow
        "/dot.dir/f": False,
        "/dotXdir/f": True,     # would be denied if '.' were any-char
        "/wildANYTHINGcat": False,
        "/wild": True,          # wildcard needs the 'cat' tail
        "/end": False,
        "/endless": True,       # '$' anchor respected
    }
    batch = spark.createDataFrame(
        [(p, "h0", p) for p in cases], "url string, url_domain string, url_path string"
    )
    got = {r["url"]: r["robots_authorized"] for r in evaluate_robots(batch, rules).collect()}
    assert got == cases


def test_shuffle_join_path_matches_broadcast(spark):
    """broadcast=False (the 10^8-domain rules-table configuration) must
    plan a non-broadcast equi-join and produce identical verdicts."""
    from sosse_spark.operators.robots import evaluate_robots, robots_rules_rows

    rows = robots_rules_rows("h0", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n")
    rules = spark.createDataFrame(
        rows, "domain string, kind string, pattern string, pattern_len int"
    )
    batch = spark.createDataFrame(
        [(f"u{i}", "h0", p) for i, p in enumerate(["/private/x", "/private/ok/y", "/pub"])],
        "url string, url_domain string, url_path string",
    )
    bc = {r["url"]: r["robots_authorized"] for r in evaluate_robots(batch, rules).collect()}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = evaluate_robots(batch, rules, broadcast=False)
        sj = {r["url"]: r["robots_authorized"] for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert sj == bc == {"u0": False, "u1": True, "u2": True}
    assert "BroadcastHashJoin" not in plan.split("LeftOuter")[0] or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
