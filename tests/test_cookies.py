"""Cookie jar semantics — mirrors se/test_cookie.py case-for-case
(domain exact/subdomain, secure, path trail/no-trail, set validation
incl. cross-site and TLD rejection) plus header ordering, latest-wins
upsert, expiry GC, and session-sync deletion."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sosse_spark.operators.cookies import (
    COOKIE_SCHEMA,
    SET_COOKIE_SCHEMA,
    cookie_header,
    match_cookies,
    normalize_set_cookies,
    registrable_domain_col,
    sync_delete_missing,
    upsert_cookies,
)

def _now():
    return F.lit(datetime(2024, 1, 2)).cast("timestamp")


def _jar(spark, rows):
    full = [
        {
            "domain": r["domain"],
            "domain_cc": r.get("domain_cc"),
            "inc_subdomain": r.get("inc_subdomain", False),
            "name": r["name"],
            "value": r.get("value", "v"),
            "path": r.get("path", ""),
            "expires": r.get("expires"),
            "secure": r.get("secure", False),
            "same_site": r.get("same_site", "Lax"),
            "http_only": r.get("http_only", False),
        }
        for r in rows
    ]
    return spark.createDataFrame(full, COOKIE_SCHEMA)


REF_JAR = [
    # the five fixtures of se/test_cookie.py:22-59
    {"domain": "test.com", "name": "test_name", "value": "test_value"},
    {"domain": "test2.com", "name": "test2_name", "value": "test2_value", "inc_subdomain": True},
    {"domain": "test3.com", "name": "test3_name", "value": "test3_value", "secure": True},
    {"domain": "test4.com", "name": "test4_name", "value": "test4_value", "path": "/test/"},
    {"domain": "test5.com", "name": "test5_name", "value": "test5_value", "path": "/test"},
]


def _matches(spark, url):
    jar = _jar(spark, REF_JAR)
    urls = spark.createDataFrame([(url,)], "url string")
    got = match_cookies(jar, urls, _now()).select("name").collect()
    return sorted(r["name"] for r in got)


def test_domain_no_sub(spark):
    # se/test_cookie.py:61-65
    assert _matches(spark, "http://test.com/") == ["test_name"]
    assert _matches(spark, "http://test2.com/") == ["test2_name"]
    assert _matches(spark, "https://test.com/") == ["test_name"]
    assert _matches(spark, "https://test2.com/") == ["test2_name"]


def test_domain_sub(spark):
    # se/test_cookie.py:67-69
    assert _matches(spark, "http://www.test.com/") == []
    assert _matches(spark, "http://www.test2.com/") == ["test2_name"]


def test_secure(spark):
    # se/test_cookie.py:71-73
    assert _matches(spark, "http://test3.com/") == []
    assert _matches(spark, "https://test3.com/") == ["test3_name"]


@pytest.mark.parametrize("domain,name", [("test4.com", "test4_name"), ("test5.com", "test5_name")])
def test_path(spark, domain, name):
    # se/test_cookie.py:75-84: trailing-slash-insensitive prefix match
    assert _matches(spark, f"http://{domain}/") == []
    assert _matches(spark, f"http://{domain}/aaa") == []
    assert _matches(spark, f"http://{domain}/test") == [name]
    assert _matches(spark, f"http://{domain}/test/") == [name]
    assert _matches(spark, f"http://{domain}/test/sub") == [name]


def test_non_http_scheme_no_match(spark):
    assert _matches(spark, "ftp://test.com/") == []


def test_expired_dropped(spark):
    jar = _jar(
        spark,
        [
            {"domain": "e.com", "name": "live", "expires": datetime(2024, 6, 1)},
            {"domain": "e.com", "name": "dead", "expires": datetime(2023, 6, 1)},
        ],
    )
    urls = spark.createDataFrame([("http://e.com/",)], "url string")
    got = sorted(r["name"] for r in match_cookies(jar, urls, _now()).collect())
    assert got == ["live"]


def _set(spark, url, cookies):
    rows = [
        {
            "url": url,
            "name": c["name"],
            "value": c.get("value", "v"),
            "domain_attr": c.get("domain"),
            "path": c.get("path"),
            "expires": c.get("expires"),
            "secure": c.get("secure", False),
            "same_site": c.get("same_site"),
            "http_only": c.get("http_only", False),
        }
        for c in cookies
    ]
    raw = spark.createDataFrame(rows, SET_COOKIE_SCHEMA)
    return normalize_set_cookies(raw).collect()


def test_set_valid(spark):
    # se/test_cookie.py:86-96
    c = _set(spark, "http://validcookie.com/", [{"name": "valid_name", "value": "valid_value"}])
    assert len(c) == 1
    assert c[0]["domain"] == "validcookie.com"
    assert c[0]["inc_subdomain"] is False
    assert c[0]["same_site"] == "Lax"


def test_set_domain(spark):
    # se/test_cookie.py:98-133: Domain attr ⇒ inc_subdomain; sibling
    # subdomain allowed (same registrable domain)
    c = _set(spark, "http://validcookie.com/", [{"name": "n", "domain": "validcookie.com"}])
    assert len(c) == 1 and c[0]["inc_subdomain"] is True and c[0]["domain"] == "validcookie.com"

    c = _set(spark, "http://sub1.validcookie.com/", [{"name": "n", "domain": "sub2.validcookie.com"}])
    assert len(c) == 1 and c[0]["domain"] == "sub2.validcookie.com" and c[0]["inc_subdomain"] is True
    assert c[0]["domain_cc"] == "sub2.validcookie.com"


def test_set_invalid(spark):
    # se/test_cookie.py:135-183: TLD cookies and cross-site sets rejected
    assert _set(spark, "http://invalidcookie.com/", [{"name": "n", "domain": "com"}]) == []
    assert _set(spark, "http://invalidcookie.com/", [{"name": "n", "domain": ".com"}]) == []
    assert _set(spark, "http://invalidcookie.com/", [{"name": "n", "domain": "test.com"}]) == []
    assert _set(spark, "http://com/", [{"name": "n", "domain": "com"}]) == []
    # attr-less cookie on a bare-TLD host also rejected (se/cookie.py:135)
    assert _set(spark, "http://com/", [{"name": "n"}]) == []


def test_set_two_level_suffix(spark):
    # co.uk is a public suffix: a.co.uk and b.co.uk are DIFFERENT sites
    assert _set(spark, "http://a.co.uk/", [{"name": "n", "domain": "b.co.uk"}]) == []
    assert _set(spark, "http://a.co.uk/", [{"name": "n", "domain": "co.uk"}]) == []
    c = _set(spark, "http://www.a.co.uk/", [{"name": "n", "domain": "a.co.uk"}])
    assert len(c) == 1 and c[0]["domain"] == "a.co.uk"


def test_registrable_domain_col(spark):
    df = spark.createDataFrame(
        [("www.example.com",), ("example.com",), ("com",), ("x.co.uk",), ("co.uk",)],
        "h string",
    )
    got = [r["r"] for r in df.select(registrable_domain_col(F.col("h")).alias("r")).collect()]
    assert got == ["example.com", "example.com", None, "x.co.uk", None]


def test_cookie_header_order(spark):
    # longest path first (RFC 6265 §5.4), then name
    jar = _jar(
        spark,
        [
            {"domain": "h.com", "name": "b", "value": "2", "path": "/a/b"},
            {"domain": "h.com", "name": "a", "value": "1", "path": "/a"},
            {"domain": "h.com", "name": "c", "value": "3", "path": ""},
        ],
    )
    urls = spark.createDataFrame([("http://h.com/a/b/c",)], "url string")
    hdr = cookie_header(match_cookies(jar, urls, _now())).collect()[0]["cookie_header"]
    assert hdr == "b=2; a=1; c=3"


def test_upsert_latest_wins_and_expiry_gc(spark):
    jar = _jar(
        spark,
        [
            {"domain": "u.com", "name": "k", "value": "old"},
            {"domain": "u.com", "name": "gone", "expires": datetime(2023, 1, 1)},
        ],
    )
    new = _jar(spark, [{"domain": "u.com", "name": "k", "value": "new"}])
    merged = upsert_cookies(jar, new, _now()).collect()
    by_name = {r["name"]: r for r in merged}
    assert by_name["k"]["value"] == "new"
    assert "gone" not in by_name  # expired rows GC'd at upsert


def test_sync_delete_missing(spark):
    # se/cookie.py:155-161: a response that no longer carries a cookie
    # deletes it for that URL; other domains untouched
    jar = _jar(
        spark,
        [
            {"domain": "s.com", "name": "keep"},
            {"domain": "s.com", "name": "drop"},
            {"domain": "other.com", "name": "untouched"},
        ],
    )
    set_events = spark.createDataFrame([("http://s.com/", "keep")], "url string, name string")
    left = sorted(r["name"] for r in sync_delete_missing(jar, set_events, _now()).collect())
    assert left == ["keep", "untouched"]


def test_import_netscape_cookies(spark):
    # se/cookies_import.py → Cookie.set_from_jar(None, jar): the url=None
    # branch — no validation, flag column becomes inc_subdomain,
    # leading dot dropped, #HttpOnly_ prefix honored, comments skipped
    lines = [
        "# Netscape HTTP Cookie File",
        "",
        ".example.com\tTRUE\t/\tFALSE\t2000000000\tsess\tabc",
        "host.example.com\tFALSE\t/app\tTRUE\t0\tk\tv",
        "#HttpOnly_.secure.org\tTRUE\t/\tTRUE\t2000000000\thk\thv",
        "not-a-cookie-line",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    from sosse_spark.operators.cookies import import_netscape_cookies

    got = {r["name"]: r for r in import_netscape_cookies(df).collect()}
    assert set(got) == {"sess", "k", "hk"}
    assert got["sess"]["domain"] == "example.com"
    assert got["sess"]["inc_subdomain"] is True
    assert got["sess"]["domain_cc"] == "example.com"
    assert got["sess"]["expires"] is not None
    assert got["k"]["domain"] == "host.example.com"
    assert got["k"]["inc_subdomain"] is False
    assert got["k"]["domain_cc"] is None
    assert got["k"]["secure"] is True
    assert got["k"]["expires"] is None  # 0 ⇒ session cookie
    assert got["k"]["path"] == "/app"
    assert got["hk"]["http_only"] is True
    assert got["hk"]["domain"] == "secure.org"


def test_upsert_intra_round_tie_prefers_latest_expiry(spark):
    # two same-key rows in one round: the later-expiring one wins
    # (struct ordering leads with expires, then value)
    a = _jar(spark, [{"domain": "t.com", "name": "k", "value": "a",
                      "expires": datetime(2026, 1, 1)}])
    b = _jar(spark, [{"domain": "t.com", "name": "k", "value": "b",
                      "expires": datetime(2024, 6, 1)}])
    merged = upsert_cookies(None, a.unionByName(b), _now()).collect()
    assert len(merged) == 1
    assert merged[0]["value"] == "a"


def test_upsert_seq_response_order_wins(spark):
    # same-response session-cookie rotation: the LATER Set-Cookie (higher
    # seq — the order the reference's update_or_create loop applies them
    # in) wins even though it sorts LOWER on (expires, value)
    old = _jar(spark, [{"domain": "t.com", "name": "k", "value": "z-older-sorts-higher",
                        "expires": datetime(2027, 1, 1)}]).withColumn("seq", F.lit(0))
    new = _jar(spark, [{"domain": "t.com", "name": "k", "value": "a-newer"}]).withColumn(
        "seq", F.lit(1)
    )
    merged = upsert_cookies(None, old.unionByName(new), _now())
    assert "seq" not in merged.columns  # ordering column never persists
    rows = merged.collect()
    assert len(rows) == 1 and rows[0]["value"] == "a-newer"


def test_normalize_passes_seq_through(spark):
    raw = spark.createDataFrame(
        [{"seq": 7, "url": "http://t.com/", "name": "n", "value": "v",
          "domain_attr": None, "path": None, "expires": None,
          "secure": False, "same_site": None, "http_only": False}],
        "seq int, " + SET_COOKIE_SCHEMA,
    )
    out = normalize_set_cookies(raw)
    assert "seq" in out.columns
    assert out.collect()[0]["seq"] == 7


def test_configure_public_suffixes_psl_registries(spark):
    """PSL private registries (github.io, s3.amazonaws.com) loaded into
    the structural rule: sibling subdomains become cross-site."""
    from sosse_spark.operators.cookies import configure_public_suffixes

    # default structural rule: github.io looks registrable, so the
    # sibling set is (divergently) accepted — the gap being closed
    assert len(_set(spark, "http://a.github.io/", [{"name": "n", "domain": "b.github.io"}])) == 1
    try:
        configure_public_suffixes(["co.uk", "github.io", "s3.amazonaws.com"])
        assert _set(spark, "http://a.github.io/", [{"name": "n", "domain": "b.github.io"}]) == []
        assert _set(spark, "http://a.github.io/", [{"name": "n", "domain": "github.io"}]) == []
        c = _set(spark, "http://www.a.github.io/", [{"name": "n", "domain": "a.github.io"}])
        assert len(c) == 1 and c[0]["domain"] == "a.github.io"
        # 3-label suffix: sibling buckets are different sites
        assert _set(
            spark, "http://x.s3.amazonaws.com/", [{"name": "n", "domain": "y.s3.amazonaws.com"}]
        ) == []
        # the rest of the configured list still works
        assert _set(spark, "http://a.co.uk/", [{"name": "n", "domain": "b.co.uk"}]) == []
    finally:
        configure_public_suffixes(None)
    # default restored
    assert len(_set(spark, "http://a.github.io/", [{"name": "n", "domain": "b.github.io"}])) == 1


def test_load_psl_suffixes_optional():
    from sosse_spark.operators.cookies import load_psl_suffixes

    got = load_psl_suffixes()
    # publicsuffix2 absent → None (structural rule stays); present →
    # multi-label literal rules only
    assert got is None or (len(got) > 0 and all("." in s and "*" not in s for s in got))


def _set_with_suffixes(spark, url, cookies, suffixes):
    rows = [
        {
            "url": url,
            "name": c["name"],
            "value": c.get("value", "v"),
            "domain_attr": c.get("domain"),
            "path": c.get("path"),
            "expires": c.get("expires"),
            "secure": c.get("secure", False),
            "same_site": c.get("same_site"),
            "http_only": c.get("http_only", False),
        }
        for c in cookies
    ]
    raw = spark.createDataFrame(rows, SET_COOKIE_SCHEMA)
    return normalize_set_cookies(raw, suffixes=suffixes).collect()


def test_psl_snapshot_multi_label_rejects_cross_site(spark):
    """VERDICT r4 #8: a vendored public-suffix snapshot (PSL file
    format) loaded through load_psl_suffixes(path=...) must make
    github.io-style multi-label registries reject cross-site
    Set-Cookie between sibling subdomains — exercised per-call, no
    module-global mutation."""
    import os

    from sosse_spark.operators.cookies import load_psl_suffixes

    snap = os.path.join(os.path.dirname(__file__), "fixtures", "public_suffix_snapshot.dat")
    rules = load_psl_suffixes(path=snap)
    # multi-label literals only; wildcard *.ck and exception !www.ck skipped
    assert rules is not None and "co.uk" in rules and "github.io" in rules
    assert all("*" not in r and not r.startswith("!") for r in rules)
    assert "com" not in rules  # single-label handled structurally

    # sibling subdomains of a private registry: cross-site, rejected
    assert _set_with_suffixes(
        spark, "http://a.github.io/", [{"name": "n", "domain": "b.github.io"}], rules
    ) == []
    # the registry itself is a public suffix: TLD-reject
    assert _set_with_suffixes(
        spark, "http://a.github.io/", [{"name": "n", "domain": "github.io"}], rules
    ) == []
    # same registrable domain still accepted
    c = _set_with_suffixes(
        spark, "http://www.a.github.io/", [{"name": "n", "domain": "a.github.io"}], rules
    )
    assert len(c) == 1 and c[0]["domain"] == "a.github.io"
    # 3-label private registry from the snapshot
    assert _set_with_suffixes(
        spark, "http://x.s3.amazonaws.com/", [{"name": "n", "domain": "y.s3.amazonaws.com"}], rules
    ) == []
    # ICANN multi-label from the snapshot
    assert _set_with_suffixes(
        spark, "http://a.co.uk/", [{"name": "n", "domain": "b.co.uk"}], rules
    ) == []

    # per-call isolation: the module default is untouched, so the same
    # sibling set is (divergently) accepted without the snapshot
    assert len(_set(spark, "http://a.github.io/", [{"name": "n", "domain": "b.github.io"}])) == 1


def test_load_psl_suffixes_host_selection_and_truncation_warning():
    import os
    import warnings

    from sosse_spark.operators.cookies import load_psl_suffixes

    snap = os.path.join(os.path.dirname(__file__), "fixtures", "public_suffix_snapshot.dat")
    # hosts= selects only rules that are dot-suffixes of the live hosts
    rules = load_psl_suffixes(path=snap, hosts=["a.github.io", "shop.example.co.uk"])
    assert set(rules) == {"github.io", "co.uk"}
    # truncation past max_rules warns instead of silently dropping
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        truncated = load_psl_suffixes(max_rules=2, path=snap)
    assert len(truncated) == 2
    assert any(
        issubclass(w.category, RuntimeWarning) and "dropping" in str(w.message) for w in caught
    )
