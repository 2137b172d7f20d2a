"""OpenSearch Description import (sosse-admin load_se,
se/management/commands/load_se.py + SearchEngine.parse_odf,
se/models.py:253-290): parse arms, default/skip rules, and the
update-or-create MERGE keyed by short_name."""

from sosse_spark.operators.opensearch import (
    load_search_engines,
    parse_odf,
    parse_opensearch_batch,
)

NS = "http://a9.com/-/spec/opensearch/1.1/"

FULL = (
    f'<OpenSearchDescription xmlns="{NS}">'
    "<ShortName>Brave Search</ShortName>"
    "<LongName>Brave Web Search</LongName>"
    "<Description>Search the web privately</Description>"
    '<Url type="text/html" template="https://search.brave.com/search?q={searchTerms}"/>'
    '<Url type="application/x-suggestions+json" template="https://search.brave.com/sug?q={searchTerms}"/>'
    "</OpenSearchDescription>"
)


def test_parse_odf_full_descriptor():
    row = parse_odf(FULL)
    assert row == {
        "short_name": "Brave Search",
        "long_name": "Brave Web Search",
        "description": "Search the web privately",
        "html_template": "https://search.brave.com/search?q={searchTerms}",
        "suggestion_template": "https://search.brave.com/sug?q={searchTerms}",
        # first word of the lower-cased ShortName (se/models.py:281)
        "shortcut": "brave",
    }


def test_parse_odf_defaults_and_skips():
    # LongName missing -> defaults to ShortName (se/models.py:266-271)
    row = parse_odf(
        f'<OpenSearchDescription xmlns="{NS}"><ShortName>Mini</ShortName>'
        "<Description>d</Description>"
        '<Url type="text/html" template="http://m/?q={searchTerms}"/>'
        "</OpenSearchDescription>"
    )
    assert row["long_name"] == "Mini" and row["shortcut"] == "mini"
    # ShortName missing -> skipped entirely (se/models.py:258-260)
    assert parse_odf(f'<OpenSearchDescription xmlns="{NS}"><Description>x</Description></OpenSearchDescription>') is None
    # non-descriptor XML and non-XML -> skipped
    assert parse_odf("<html><body>nope</body></html>") is None
    assert parse_odf("not xml at all") is None
    # namespace-less descriptors also parse (ns = '' arm of the slice)
    row = parse_odf(
        "<OpenSearchDescription><ShortName>Raw</ShortName>"
        '<Url type="text/html" template="http://r/?q={searchTerms}"/>'
        "</OpenSearchDescription>"
    )
    assert row["short_name"] == "Raw" and row["html_template"] == "http://r/?q={searchTerms}"


def test_batch_parse_skips_non_descriptors(spark):
    df = spark.createDataFrame(
        [(FULL,), ("<html>no</html>",), ("garbage",)], "xml string"
    )
    rows = parse_opensearch_batch(df).collect()
    assert len(rows) == 1 and rows[0]["short_name"] == "Brave Search"


def test_load_search_engines_update_or_create(spark):
    existing = spark.createDataFrame(
        [
            ("Brave Search", "old long", "old desc", "http://old/?q={searchTerms}", None, "brave", False),
            ("Keeper", "keep", "keep", "http://k/?q={searchTerms}", None, "keeper", True),
        ],
        "short_name string, long_name string, description string, "
        "html_template string, suggestion_template string, shortcut string, enabled boolean",
    )
    parsed = parse_opensearch_batch(spark.createDataFrame([(FULL,)], "xml string"))
    merged = {r["short_name"]: r for r in load_search_engines(existing, parsed).collect()}
    assert set(merged) == {"Brave Search", "Keeper"}
    # updated fields from the descriptor, enabled flag PRESERVED
    assert merged["Brave Search"]["html_template"] == "https://search.brave.com/search?q={searchTerms}"
    assert merged["Brave Search"]["enabled"] is False
    assert merged["Keeper"]["long_name"] == "keep" and merged["Keeper"]["enabled"] is True
    # create arm: empty existing table
    created = load_search_engines(None, parsed).collect()
    assert len(created) == 1 and created[0]["enabled"] is True


def test_update_builtin_rows_semantics(spark):
    """UpdateBuiltinModel.handle (se/management/commands/builtin.py:
    30-68) + update_se's shortcut preservation: created / updated
    (enabled+shortcut preserved) / skipped (user-defined) / kept."""
    from sosse_spark.operators.opensearch import update_builtin_rows

    existing = spark.createDataFrame(
        [
            # builtin row: fields update, enabled + shortcut preserved
            ("Bing", "old", "http://old/?q={searchTerms}", "custom_b", False, True),
            # user-defined row: never touched
            ("Mine", "mine", "http://mine/?q={searchTerms}", "m", True, False),
            # row not in the items file: kept as-is
            ("Stale", "stale", "http://stale/?q={searchTerms}", "s", True, True),
        ],
        "short_name string, long_name string, html_template string, shortcut string, enabled boolean, builtin boolean",
    )
    items = spark.createDataFrame(
        [
            ("Bing", "Bing Search", "http://bing/?q={searchTerms}", "bing", True, True),
            ("Mine", "hijack", "http://evil/?q={searchTerms}", "m2", True, True),
            ("Fresh", "Fresh Engine", "http://fresh/?q={searchTerms}", "fresh", True, True),
        ],
        "short_name string, long_name string, html_template string, shortcut string, enabled boolean, builtin boolean",
    )
    out = {
        r["short_name"]: r
        for r in update_builtin_rows(
            existing, items, "short_name", preserve_fields=("enabled", "shortcut")
        ).collect()
    }
    assert out["Bing"]["action"] == "updated"
    assert out["Bing"]["long_name"] == "Bing Search"
    assert out["Bing"]["html_template"] == "http://bing/?q={searchTerms}"
    assert out["Bing"]["shortcut"] == "custom_b"  # user's shortcut survives
    assert out["Bing"]["enabled"] is False  # user's disable survives
    assert out["Mine"]["action"] == "skipped"
    assert out["Mine"]["long_name"] == "mine" and out["Mine"]["shortcut"] == "m"
    assert out["Fresh"]["action"] == "created"
    assert out["Fresh"]["builtin"] is True and out["Fresh"]["enabled"] is True
    assert out["Stale"]["action"] == "kept"
    assert out["Stale"]["long_name"] == "stale"
    # empty table: everything created, builtin defaulted True
    created = update_builtin_rows(None, items.drop("builtin"), "short_name").collect()
    assert all(r["action"] == "created" and r["builtin"] is True for r in created)


def test_conflicting_shortcuts(spark):
    from sosse_spark.operators.opensearch import conflicting_shortcuts

    engines = spark.createDataFrame(
        [
            ("A", "x", True),
            ("B", "x", True),   # x claimed twice by ENABLED engines
            ("C", "y", True),
            ("D", "y", False),  # disabled claim does not conflict
        ],
        "short_name string, shortcut string, enabled boolean",
    )
    rows = conflicting_shortcuts(engines).collect()
    assert len(rows) == 1 and rows[0]["shortcut"] == "x" and rows[0]["shortcut_count"] == 2
