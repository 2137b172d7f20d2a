"""Cookie jar as a partitioned table + relational match/upsert algebra.

Reference parity — se/cookie.py (Cookie model):
  * storage key (domain, path, name), fields domain_cc / inc_subdomain /
    value / path / expires / secure / same_site / http_only
    (se/cookie.py:41-53)
  * `get_from_url` matching (se/cookie.py:58-104): http(s) only; secure
    cookies only over https; exact-domain rows always match, the
    inc_subdomain rows match when '.'+domain is a suffix of the URL
    host; path matches when the cookie path (sans trailing '/') is
    empty, equals the URL path (sans trailing '/'), or is a '/'-bounded
    prefix of it; expired rows are dropped.
  * `set` validation (se/cookie.py:106-162): a Domain= attribute makes
    the cookie subdomain-inclusive after stripping the leading dot, but
    is REJECTED when its registrable domain (eTLD+1) differs from the
    URL host's (cross-site set) or when the target is a bare public
    suffix (TLD cookie); attribute-less cookies are host-only.
    Upsert is update-or-create on (domain, path, name); cookies the
    response's jar no longer carries are deleted for that URL
    (session-sync, se/cookie.py:155-161).

Spark-first shape: the jar is a DataFrame bucketed on `domain`; URL
matching is a THIN equi-join — the URL side explodes its host into its
dot-suffixes (bounded by label count, ≤ ~6 rows per URL) and joins
`suffix == domain`, so a 10^8-row jar never broadcasts and never
cross-joins.  Validation and path/secure/expiry predicates are pure
column algebra (whole-stage codegen).

Public-suffix approximation: the reference loads the full Mozilla PSL
via publicsuffix2; this engine carries the structural rule (last label,
or last two for a small built-in set of two-level suffixes) — identical
semantics for every domain the tests and the synthetic web generate,
and documented as an approximation for exotic registries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "COOKIE_SCHEMA",
    "SET_COOKIE_SCHEMA",
    "public_suffix_col",
    "registrable_domain_col",
    "configure_public_suffixes",
    "load_psl_suffixes",
    "normalize_set_cookies",
    "match_cookies",
    "cookie_header",
    "upsert_cookies",
    "stale_cookie_keys",
    "sync_delete_missing",
    "import_netscape_cookies",
]

# persisted jar row (se/cookie.py:41-53)
COOKIE_SCHEMA = (
    "domain string, domain_cc string, inc_subdomain boolean, name string, "
    "value string, path string, expires timestamp, secure boolean, "
    "same_site string, http_only boolean"
)

# one raw Set-Cookie observation before validation
SET_COOKIE_SCHEMA = (
    "url string, name string, value string, domain_attr string, path string, "
    "expires timestamp, secure boolean, same_site string, http_only boolean"
)

# multi-label public suffixes recognized by the structural rule (subset
# of the PSL covering the registries exercised in tests; the rule "last
# label, or these multi-label endings" is the documented approximation
# of the reference's full Mozilla PSL lookup, se/cookie.py:120-127)
_DEFAULT_MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr",
)
_TWO_LEVEL_SUFFIXES = _DEFAULT_MULTI_LABEL_SUFFIXES


# constant-pattern regexes keep the expression tree tiny — the earlier
# split/slice/array formulation expanded so large through CollapseProject
# that whole-stage codegen exceeded janino's method limit and fell back
# to interpreted evaluation


def _clean_suffixes(suffixes) -> tuple:
    clean = tuple(
        s.strip(".").lower()
        for s in suffixes
        if s and "." in s and "*" not in s and not s.startswith("!")
    )
    if not clean:
        raise ValueError("suffixes must contain at least one multi-label entry")
    return clean


def _suffix_alt(suffixes=None) -> str:
    """The regex alternation for a suffix list (default: the
    process-default list set by configure_public_suffixes)."""
    suf = _TWO_LEVEL_SUFFIXES if suffixes is None else _clean_suffixes(suffixes)
    return "|".join(s.replace(".", r"\.") for s in suf)


def configure_public_suffixes(suffixes=None) -> tuple:
    """Override the process-DEFAULT multi-label suffix list (None
    restores the built-in default).  Entries are literal multi-label
    suffixes ('co.uk', 'github.io', 's3.amazonaws.com') — closing the
    gap the default list leaves for PSL private-domain registries,
    where cross-site Set-Cookie between sibling subdomains must be
    rejected.

    Prefer the per-call `suffixes=` parameter on public_suffix_col /
    registrable_domain_col / normalize_set_cookies: plans capture the
    alternation at BUILD time, so a plan built before a reconfigure
    keeps the old list, and two engines in one process with different
    suffix configs would interfere through this global.  This hook
    remains for single-engine deployments that want one list
    everywhere.

    The list compiles into ONE constant regex alternation, so keep it
    to the registries a deployment actually crawls (order hundreds):
    the full ~9,500-rule PSL as a single pattern would exceed the JVM
    constant-pool string limit and break codegen.  When publicsuffix2
    is installed, `load_psl_suffixes()` feeds this hook."""
    global _TWO_LEVEL_SUFFIXES
    if suffixes is None:
        _TWO_LEVEL_SUFFIXES = _DEFAULT_MULTI_LABEL_SUFFIXES
    else:
        _TWO_LEVEL_SUFFIXES = _clean_suffixes(suffixes)
    return _TWO_LEVEL_SUFFIXES


def load_psl_suffixes(max_rules: int = 2000, hosts=None, path=None):
    """Multi-label rules from the publicsuffix2 package's bundled
    Mozilla PSL, for `configure_public_suffixes` — or None when the
    package is not installed (the structural rule stays in force).
    Pass `path` to parse a public_suffix_list.dat-format snapshot
    directly (``//`` comments, one rule per line — the format
    published at publicsuffix.org) without the package.  Wildcard and
    exception rules are skipped (the structural rule cannot express
    them).

    `max_rules` caps the constant-pattern size; when the PSL has more
    eligible rules than fit, a RuntimeWarning is emitted naming how
    many were dropped (file order keeps the ICANN section, which the
    PSL lists first, ahead of private-domain registries) — silently
    treating a truncated registry as registrable would accept
    cross-site Set-Cookie between its sibling subdomains.  Pass
    `hosts` (the crawl's host set) to keep ONLY rules that are
    dot-suffixes of those hosts: a deployment's live host set selects
    a few dozen rules, which both fits the cap and names exactly the
    registries that matter."""
    if path is not None:
        tlds = []
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("//"):
                    continue
                tlds.append(line.split()[0].lower())
    else:
        try:
            from publicsuffix2 import PublicSuffixList  # optional dependency
        except ImportError:
            return None
        tlds = PublicSuffixList().tlds
    rules = [r for r in tlds if "." in r and "*" not in r and not r.startswith("!")]
    if hosts is not None:
        endings = set()
        for h in hosts:
            labels = str(h).lower().strip(".").split(".")
            for i in range(len(labels)):
                endings.add(".".join(labels[i:]))
        rules = [r for r in rules if r.lower() in endings]
    if len(rules) > max_rules:
        import warnings

        warnings.warn(
            f"PSL has {len(rules)} eligible multi-label rules; keeping the "
            f"first {max_rules} (ICANN section leads in file order) and "
            f"dropping {len(rules) - max_rules} — hosts under dropped "
            f"registries are treated as registrable (cross-site Set-Cookie "
            f"between their sibling subdomains will be ACCEPTED).  Pass "
            f"hosts= to select only the rules your crawl needs.",
            RuntimeWarning,
            stacklevel=2,
        )
    return tuple(rules[:max_rules])


def public_suffix_col(host: Column, suffixes=None) -> Column:
    """The public suffix of `host` under the structural rule (last
    label, or the two-label ending when it is a known suffix).  The
    label boundary is required: barco.uk's suffix is uk, not co.uk.
    `suffixes` overrides the process-default multi-label list for this
    call only (captured into the plan at build time)."""
    alt = _suffix_alt(suffixes)
    two = F.regexp_extract(host, r"(?:^|\.)((?:" + alt + r"))$", 1)
    return F.when(two != "", two).otherwise(F.regexp_extract(host, r"([^.]+)$", 1))


def registrable_domain_col(host: Column, suffixes=None) -> Column:
    """eTLD+1 (what publicsuffix2.get_public_suffix returns for a
    registrable host); NULL when `host` IS a bare public suffix.
    `suffixes` overrides the process-default list per-call."""
    alt = _suffix_alt(suffixes)
    t3 = F.regexp_extract(host, r"([^.]+\.(?:" + alt + r"))$", 1)
    t2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(t3 != "", t3).otherwise(
        F.when((t2 != "") & ~t2.rlike(r"^(?:" + alt + r")$"), t2)
    )


def normalize_set_cookies(raw: DataFrame, suffixes=None) -> DataFrame:
    """Validate raw Set-Cookie rows (SET_COOKIE_SCHEMA) into jar rows
    (COOKIE_SCHEMA).  Pure column algebra mirror of Cookie.set
    (se/cookie.py:112-149): Domain= attr ⇒ inc_subdomain, leading-dot
    strip, cross-site reject (registrable-domain mismatch), TLD reject;
    attr-less ⇒ host-only.  Later duplicate keys win (update_or_create),
    resolved by the caller's upsert.  `suffixes` overrides the
    process-default multi-label public-suffix list per-call (see
    configure_public_suffixes)."""
    # stage each registrable-domain derivation as a column referenced
    # >= 2 times: inlined, the split/slice/suffix-set tree would expand
    # per reference and blow past janino's generated-method limit
    # (codegen falls back to interpreted — measured on the oracle data)
    staged = (
        raw.filter(F.col("url").rlike("^https?:"))
        .withColumn("_host", F.parse_url("url", F.lit("HOST")))
        .withColumn("_dom_attr", F.regexp_replace(F.col("domain_attr"), r"^\.+", ""))
        .withColumn(
            "_has_attr", F.col("domain_attr").isNotNull() & (F.col("_dom_attr") != "")
        )
        .withColumn(
            "_domain",
            F.when(F.col("_has_attr"), F.col("_dom_attr")).otherwise(F.col("_host")),
        )
        .withColumn("_reg_attr", registrable_domain_col(F.col("_dom_attr"), suffixes))
        .withColumn("_reg_host", registrable_domain_col(F.col("_host"), suffixes))
        .withColumn("_reg_dom", registrable_domain_col(F.col("_domain"), suffixes))
    )
    has_attr = F.col("_has_attr")
    cross_site = has_attr & (
        F.col("_reg_attr").isNull()
        | F.col("_reg_host").isNull()
        | (F.col("_reg_attr") != F.col("_reg_host"))
    )
    is_tld = F.col("_reg_dom").isNull()
    # an optional `seq` ordering column (response-sequence position)
    # rides through so the upsert can honor last-write-wins
    extra = ["seq"] if "seq" in raw.columns else []
    return (
        staged.filter(~cross_site & ~is_tld)
        .select(
            *extra,
            F.col("_domain").alias("domain"),
            F.when(has_attr, F.col("domain_attr")).alias("domain_cc"),
            has_attr.alias("inc_subdomain"),
            "name",
            "value",
            F.coalesce("path", F.lit("")).alias("path"),
            "expires",
            F.coalesce("secure", F.lit(False)).alias("secure"),
            F.coalesce("same_site", F.lit("Lax")).alias("same_site"),
            F.coalesce("http_only", F.lit(False)).alias("http_only"),
        )
    )


def _host_suffixes(host: Column) -> Column:
    """[host, parent, …, tld] — every dot-suffix of the host.  Bounded
    by label count (≤ ~6), so the explode is a constant fan-out."""
    lab = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(lab)),
        lambda i: F.array_join(F.slice(lab, i, F.size(lab)), "."),
    )


def match_cookies(jar: DataFrame, urls: DataFrame, now_col: Column) -> DataFrame:
    """Cookies applicable to each URL (Cookie.get_from_url,
    se/cookie.py:58-104): one thin equi-join on suffix==domain.

    Returns one row per (url, matching cookie) with the jar columns.
    Expired rows are filtered (the reference also deletes them; callers
    persisting the jar drop them at upsert time)."""
    u = (
        urls.select("url")
        .distinct()
        .filter(F.col("url").rlike("^https?:"))
        .select(
            "url",
            F.col("url").rlike("^https:").alias("_https"),
            F.parse_url("url", F.lit("HOST")).alias("_host"),
            F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("")).alias("_path"),
        )
        # stage the parsed columns before the HOF so CollapseProject
        # can't inline parse_url into the per-element lambda
        .select("url", "_https", "_host", "_path", F.explode(_host_suffixes(F.col("_host"))).alias("_suffix"))
    )
    cpath = F.regexp_replace(F.col("path"), "/+$", "")
    upath = F.regexp_replace(F.col("_path"), "/+$", "")
    matched = (
        u.join(jar, u["_suffix"] == jar["domain"], "inner")
        # exact-domain rows always match; proper-suffix rows need inc_subdomain
        .filter((F.col("_suffix") == F.col("_host")) | F.col("inc_subdomain"))
        .filter(F.col("_https") | ~F.col("secure"))
        .filter(
            (cpath == "")
            | (upath == cpath)
            | F.col("_path").startswith(F.concat(cpath, F.lit("/")))
        )
        .filter(F.col("expires").isNull() | (F.col("expires") > now_col))
    )
    return matched.select("url", *[f.strip().split(" ")[0] for f in COOKIE_SCHEMA.split(",")])


def cookie_header(matched: DataFrame) -> DataFrame:
    """(url, cookie_header) — 'n1=v1; n2=v2' ordered longest-path-first
    then by name (RFC 6265 §5.4 order, deterministic)."""
    ent = F.struct(
        (F.lit(10_000) - F.length("path")).alias("o"),
        F.col("name").alias("n"),
        F.col("value").alias("v"),
    )
    return matched.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(ent)),
                lambda c: F.concat(c["n"], F.lit("="), c["v"]),
            ),
            "; ",
        ).alias("cookie_header")
    )


def upsert_cookies(jar: DataFrame | None, validated: DataFrame, now_col: Column) -> DataFrame:
    """Latest-wins MERGE on (domain, path, name) (update_or_create,
    se/cookie.py:150) + expired-row GC.  `validated` may itself carry
    duplicate keys (several responses in one round): when it carries a
    `seq` ordering column (the Set-Cookie's position in its response —
    the order the reference's update_or_create loop applies them in),
    the highest seq wins, matching reference last-write-wins for
    same-response rotation (e.g. a session cookie re-set); otherwise —
    and across DIFFERENT responses of one parallel round, where neither
    engine defines an order — the highest-value row wins
    deterministically."""
    key = ["domain", "path", "name"]
    cols = [f.strip().split(" ")[0] for f in COOKIE_SCHEMA.split(",")]
    nonkey = [c for c in cols if c not in key]
    # ONE max over a struct of all non-key fields: per-column max_by with
    # a tied ordering key would break ties per column independently
    # (partition-order-dependent blend of two source rows); the struct
    # max is a deterministic total order over the whole row.  seq (when
    # present), expires and value lead the struct so the ordering stays
    # response-order-then-latest-expiry-then-value first (schema order
    # would compare domain_cc first and let a stale Domain=-attributed
    # row beat a host-only re-set).
    has_seq = "seq" in validated.columns
    ordered = (["seq"] if has_seq else []) + ["expires", "value"] + [
        c for c in nonkey if c not in ("expires", "value")
    ]
    new = (
        validated.groupBy(*key)
        .agg(F.max(F.struct(*ordered)).alias("_w"))
        .select(*key, *[F.col(f"_w.{c}").alias(c) for c in nonkey])
        .select(*cols)
    )
    if jar is None:
        merged = new
    else:
        merged = jar.select(*cols).join(new.select(*key), key, "left_anti").unionByName(new)
    return merged.filter(F.col("expires").isNull() | (F.col("expires") > now_col))


def import_netscape_cookies(lines: DataFrame) -> DataFrame:
    """Netscape/Mozilla cookies.txt import (se/cookies_import.py:79-83 →
    Cookie.set_from_jar(None, jar) → the url=None branch of Cookie.set,
    se/cookie.py:138-142: no cross-site/TLD validation; the
    include-subdomains flag becomes inc_subdomain and the stored domain
    drops its leading dot).

    `lines` is one row per file line (e.g. spark.read.text): the
    7-field tab format  domain  flag  path  secure  expires  name
    value, '#'-comment lines skipped EXCEPT the #HttpOnly_ prefix,
    which marks the cookie http-only (the prefix Mozilla writes).
    Returns COOKIE_SCHEMA rows (caller upserts them into the jar)."""
    c = F.col(lines.columns[0])
    http_only = c.startswith("#HttpOnly_")
    body = F.when(http_only, F.substring(c, len("#HttpOnly_") + 1, 1 << 20)).otherwise(c)
    return (
        lines.select(http_only.alias("_ho"), body.alias("_b"))
        .filter((F.trim(F.col("_b")) != "") & ~F.col("_b").startswith("#"))
        .select(F.col("_ho"), F.split("_b", "\t").alias("_f"))
        .filter(F.size("_f") >= 7)
        .select(
            F.regexp_replace(F.col("_f")[0], r"^\.+", "").alias("domain"),
            F.when(F.upper(F.col("_f")[1]) == "TRUE",
                   F.regexp_replace(F.col("_f")[0], r"^\.+", "")).alias("domain_cc"),
            (F.upper(F.col("_f")[1]) == "TRUE").alias("inc_subdomain"),
            F.col("_f")[5].alias("name"),
            F.col("_f")[6].alias("value"),
            F.col("_f")[2].alias("path"),
            F.when(F.col("_f")[4].cast("long") > 0,
                   F.timestamp_seconds(F.col("_f")[4].cast("long"))).alias("expires"),
            (F.upper(F.col("_f")[3]) == "TRUE").alias("secure"),
            F.lit("Lax").alias("same_site"),
            F.col("_ho").alias("http_only"),
        )
    )


def stale_cookie_keys(jar: DataFrame, set_events: DataFrame, now_col: Column) -> DataFrame:
    """(domain, path, name) keys of jar cookies matching a cookie-
    setting response's URL whose names were NOT re-set — the deletion
    set of the session sync (se/cookie.py:155-161).  `set_events` =
    (url, name) rows of every cookie the response carried."""
    matched = match_cookies(jar, set_events.select("url").distinct(), now_col)
    return (
        matched.join(set_events, ["url", "name"], "left_anti")
        .select("domain", "path", "name")
        .distinct()
    )


def sync_delete_missing(jar: DataFrame, set_events: DataFrame, now_col: Column) -> DataFrame:
    """Session-sync deletion (se/cookie.py:155-161): drop the
    stale_cookie_keys rows from the jar."""
    key = ["domain", "path", "name"]
    return jar.join(stale_cookie_keys(jar, set_events, now_col), key, "left_anti")
