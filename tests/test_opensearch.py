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
