"""Link admission: blocklist, collection scope regexes, depth budgets,
cross-collection routing — all broadcast column algebra.

Reference parity (Document.queue, se/document.py:603-694):
  1. exact + prefix ExcludedUrl blocklist (se/document.py:603-613)
  2. collection excluded_regex reject (se/document.py:618)
  3. unlimited_regex ⇒ admit with the collection's full recursion_depth
     (se/document.py:626-630)
  4. limited_regex AND parent budget > 0 ⇒ admit with parent depth − 1
     (se/document.py:632-639)
  5. otherwise: cross-collection routing — best-matching other
     collection wins by LONGEST regex match (Collection.get_from_url,
     se/collection.py:306-339); seeds (no parent) always admitted with
     full depth (se/document.py:684-685)

Collections/exclusions are tiny dimension tables → broadcast; regexes
are precompiled per collection at config load (multiline → OR-join,
se/utils.py:220-230) and evaluated with codegen'd rlike.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CollectionPolicy",
    "build_multiline_re",
    "admit_links",
    "route_cross_collection",
    "policy_export",
    "policy_import",
    "mass_delete_selection",
]


def build_multiline_re(lines: str) -> str:
    """OR-join a multiline pattern config, '#'-comments stripped
    (parity: se/utils.py:220-230)."""
    pats = []
    for line in lines.splitlines():
        line = line.split("#", 1)[0].strip()
        if line:
            pats.append(line)
    if not pats:
        return ""
    if len(pats) == 1:
        return pats[0]
    return "(" + "|".join(pats) + ")"


@dataclass(frozen=True)
class CollectionPolicy:
    """≙ Collection (se/collection.py:61-294), crawl-relevant fields."""

    collection_id: int
    unlimited_regex: str = ""  # multiline, pre-build with build_multiline_re
    limited_regex: str = ""
    excluded_regex: str = ""
    recursion_depth: int = 0
    keep_params: bool = True
    hash_no_numbers: bool = False  # hash_mode (se/collection.py:71-76)
    recrawl_freq: str = "adaptive"  # none | constant | adaptive
    recrawl_dt_min: int = 3600  # seconds
    recrawl_dt_max: int = 3 * 3600
    recrawl_condition: str = "change"  # change | always | manual
    queue_to_any_collection: bool = False
    queue_to_collections: tuple = field(default_factory=tuple)
    # P17 webhook trigger conditions kept as metric events
    # (se/webhook.py:108-117): subset of discovery|change|always|manual
    webhooks: tuple = field(default_factory=tuple)
    # full webhook DELIVERY configs (operators/webhooks.WebhookConfig ≙
    # the Webhook model, se/webhook.py:99-193): when non-empty the
    # engine runs the delivery stage each round and stores real
    # outcomes in documents.webhooks_result + the webhook_results log
    webhook_configs: tuple = field(default_factory=tuple)
    # form auth (se/collection.py:244-255): a redirect landing on a URL
    # matching auth_login_url_re triggers the auth kernel; auth_fields
    # are (key, value) pairs overlaid on the scraped form inputs
    # (≙ authfield_set, se/browser_request.py:264-265)
    auth_login_url_re: str = ""
    auth_fields: tuple = field(default_factory=tuple)
    # P9 thumbnails (Collection.thumbnail_mode, se/collection.py:98-110):
    # preview | prevscreen | screenshot | none.  The preview-metadata
    # path runs under preview/prevscreen in html_mode; the screenshot
    # arm is browser-bound and not portable (SURVEY §7.4), so under
    # screenshot/none no preview is attempted.  In the image graft the
    # document thumbnails ITSELF whenever the mode is active
    # (se/document.py:484-487).
    thumbnail_mode: str = "prevscreen"


def admit_links(
    links: DataFrame,
    policy: CollectionPolicy,
    excluded_exact: Optional[list[str]] = None,
    excluded_prefix: Optional[list[str]] = None,
) -> DataFrame:
    """Filter + depth-budget candidate links of ONE collection.

    Input columns: url, parent_recurse (parent's remaining budget; null
    for seeds).  Output adds crawl_recurse and keeps only admitted rows.
    `admitted_reason` ∈ unlimited|limited|seed for test introspection.
    """
    df = links

    # 1. blocklist (broadcast literals; exact + startswith)
    if excluded_exact:
        df = df.filter(~F.col("url").isin(excluded_exact))
    if excluded_prefix:
        cond = None
        for p in excluded_prefix:
            c = F.col("url").startswith(p)
            cond = c if cond is None else (cond | c)
        df = df.filter(~cond)

    # 2. collection excluded_regex
    if policy.excluded_regex:
        df = df.filter(~F.col("url").rlike(policy.excluded_regex))

    is_seed = F.col("parent_recurse").isNull()
    unlimited = (
        F.col("url").rlike(policy.unlimited_regex) if policy.unlimited_regex else F.lit(False)
    )
    limited = (
        (F.col("url").rlike(policy.limited_regex) & (F.col("parent_recurse") > 0))
        if policy.limited_regex
        else F.lit(False)
    )

    df = df.withColumn(
        "admitted_reason",
        F.when(is_seed, F.lit("seed"))
        .when(unlimited, F.lit("unlimited"))
        .when(limited, F.lit("limited"))
        .otherwise(F.lit(None).cast("string")),
    ).filter(F.col("admitted_reason").isNotNull())

    return df.withColumn(
        "crawl_recurse",
        F.when(F.col("admitted_reason") == "limited", F.col("parent_recurse") - 1)
        .otherwise(F.lit(policy.recursion_depth))
        .cast("int"),
    )


def route_cross_collection(
    rejected: DataFrame,
    policies: list[CollectionPolicy],
    source_policy: CollectionPolicy,
) -> DataFrame:
    """Re-queue URLs that missed their own collection's scope to the
    best-matching other collection: LONGEST regexp_extract match wins
    (parity: se/collection.py:306-339 REGEXP_SUBSTR-length annotate).

    Returns (url, collection_id, match_len) for the winning collection
    per URL; URLs with no match anywhere are dropped.
    """
    if source_policy.queue_to_any_collection:
        targets = [p for p in policies if p.collection_id != source_policy.collection_id]
    elif source_policy.queue_to_collections:
        allowed = set(source_policy.queue_to_collections)
        targets = [p for p in policies if p.collection_id in allowed]
    else:
        return rejected.sparkSession.createDataFrame(
            [], "url string, collection_id int, match_len int"
        )

    scored = []
    for p in targets:
        regex = p.unlimited_regex or p.limited_regex
        if not regex:
            continue
        scored.append(
            rejected.select("url")
            .withColumn("collection_id", F.lit(p.collection_id))
            .withColumn("match_len", F.length(F.regexp_extract(F.col("url"), regex, 0)))
            .filter(F.col("match_len") > 0)
        )
    if not scored:
        return rejected.sparkSession.createDataFrame(
            [], "url string, collection_id int, match_len int"
        )
    all_scores = scored[0]
    for s in scored[1:]:
        all_scores = all_scores.unionByName(s)

    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(F.col("match_len").desc(), F.col("collection_id").asc())
    return (
        all_scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Collection/policy export-import (config round-trip for instance
# migration — CrawlPolicyBackup, se/crawl_policy_backup.py:35-231, and
# the Collection REST serializer, se/rest_api.py:508-525)
# ---------------------------------------------------------------------------

def policy_export(policies) -> str:
    """Serialize CollectionPolicy configs to a JSON document.

    Derived artifacts (the reference's precompiled ``*_regex_pg``
    columns) are NOT exported — they rebuild at load time, exactly as
    the reference serializer marks them ``read_only_fields``."""
    import json
    from dataclasses import asdict

    return json.dumps(
        {"version": 1, "collections": [asdict(p) for p in policies]},
        indent=2,
        sort_keys=True,
    )


def policy_import(text: str) -> list[CollectionPolicy]:
    """Restore CollectionPolicy configs from `policy_export` JSON.
    Unknown fields fail loudly (a config from a newer engine should
    not silently drop behavior); tuple-typed fields are rebuilt from
    their JSON arrays (auth_fields as (key, value) pairs)."""
    import dataclasses
    import json

    data = json.loads(text)
    if data.get("version") != 1:
        raise ValueError(f"unsupported policy export version: {data.get('version')!r}")
    known = {f.name for f in dataclasses.fields(CollectionPolicy)}
    out = []
    for c in data.get("collections", []):
        unknown = set(c) - known
        if unknown:
            raise ValueError(f"unknown policy fields: {sorted(unknown)}")
        c = dict(c)
        for k in ("queue_to_collections", "webhooks"):
            if k in c:
                c[k] = tuple(c[k])
        if "auth_fields" in c:
            c["auth_fields"] = tuple((k, v) for k, v in c["auth_fields"])
        if "webhook_configs" in c:
            # lazy import: webhooks.py imports build_multiline_re from
            # this module at import time
            from sosse_spark.operators.webhooks import WebhookConfig

            c["webhook_configs"] = tuple(
                WebhookConfig(
                    **{**w, "headers": tuple((hk, hv) for hk, hv in w.get("headers", ()))}
                )
                for w in c["webhook_configs"]
            )
        out.append(CollectionPolicy(**c))
    return out


def mass_delete_selection(
    df: DataFrame,
    url_regex: str,
    ignore_case: bool = False,
    exclude: str | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Row selection of the mass-delete command (se/management/commands/
    delete_documents.py:46-56): URLs matching `url_regex` (`iregex`
    when `ignore_case`), minus URLs matching `exclude` under the SAME
    case mode.  Java-regex dialect via rlike — patterns kept in the
    PG/Java common subset (F13 rule); `(?i)` implements iregex.

    Pure filter → predicate pushdown reaches the scan; no shuffle."""
    pat = f"(?i)({url_regex})" if ignore_case else url_regex
    out = df.filter(F.col(url_col).rlike(pat))
    if exclude:
        epat = f"(?i)({exclude})" if ignore_case else exclude
        out = out.filter(~F.col(url_col).rlike(epat))
    return out
