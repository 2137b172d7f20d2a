"""robots.txt parsing + allow/deny evaluation as a broadcast rules table.

Reference parity:
  * parse — Domain._parse_robotstxt/_parse_line (se/domain.py:107-173):
    comment stripping, Google-robots.cc disallow-typo normalization,
    UA-section selection (substring match on own UA beats '*'), values
    regex-escaped with '*' → '.*' and a trailing '$' anchor preserved.
  * eval — Domain.robots_authorized (se/domain.py:193-228): longest
    matching disallow loses to a STRICTLY longer matching allow; no
    matching disallow ⇒ authorized; empty/unfetched robots ⇒ authorized.

Spark shape: parsed rules live in a small `host_rules` table
(domain, kind, pattern, pattern_len) broadcast-joined onto the batch;
the longest-match fold is a groupBy max aggregation — no Python in the
match loop.  Literal-prefix rules (the overwhelming majority of real
robots files) match via codegen'd startswith; only wildcard/anchored
rules fall back to rlike (compiled per pair, bounded by batch size ×
wildcard-rule count).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_rules_rows", "evaluate_robots", "USER_AGENT"]

USER_AGENT = "sosse-spark/0.1"

_DISALLOW_TYPOS = {"dissallow", "dissalow", "disalow", "diasllow", "disallaw"}
_UA_KEYS = {"user_agent", "user agent", "useragent", "user-agent"}


def _parse_line(line: str) -> tuple[Optional[str], Optional[str]]:
    if "#" in line:
        line = line.split("#", 1)[0]
    if ":" not in line:
        return None, None
    key, val = line.split(":", 1)
    key = key.strip().lower()
    val = val.strip()
    if key in _DISALLOW_TYPOS:
        key = "disallow"
    if key in _UA_KEYS:
        key = "user-agent"
    if key not in ("user-agent", "allow", "disallow"):
        return None, None
    return key, val


def parse_robots(content: str, user_agent: str = USER_AGENT) -> list[tuple[str, str]]:
    """→ [(kind, pattern)] for the applicable UA section.  Patterns are
    escaped regexes with '*' wildcards and optional '$' anchor, matched
    with re.match semantics (anchored at path start)."""
    ua_rules: list[tuple[str, str]] = []
    generic_rules: list[tuple[str, str]] = []
    current: Optional[list] = None

    for line in content.splitlines():
        key, val = _parse_line(line)
        if key is None:
            continue
        if key == "user-agent":
            if val.lower() in user_agent.lower():
                current = ua_rules
            elif val == "*":
                current = generic_rules
            else:
                current = None
            continue
        if current is None:
            continue
        if not val:
            # A bare 'Disallow:' / 'Allow:' is the allow-all idiom: the
            # reference skips empty patterns at eval (se/domain.py:208-210
            # 'if not pattern: continue').  Emitting it as an empty regex
            # would match every path and deny the whole host — invert bug.
            continue
        pattern = re.escape(val).replace(r"\*", ".*")
        if pattern.endswith(r"\$"):
            pattern = pattern[:-2] + "$"
        current.append((key, pattern))

    return ua_rules or generic_rules or []


def robots_rules_rows(domain: str, content: Optional[str], user_agent: str = USER_AGENT) -> list[dict]:
    """Rows for the host_rules table.  A host with no/empty robots gets a
    single status row so 'fetched but allow-all' is distinguishable from
    'never fetched' (robots_status unknown/empty/loaded,
    se/domain.py:65-73)."""
    if content is None:
        return [{"domain": domain, "kind": "status", "pattern": "empty", "pattern_len": 0}]
    rules = parse_robots(content, user_agent)
    rows = [{"domain": domain, "kind": "status", "pattern": "loaded", "pattern_len": 0}]
    for kind, pattern in rules:
        rows.append({"domain": domain, "kind": kind, "pattern": pattern, "pattern_len": len(pattern)})
    return rows


def evaluate_robots(
    batch: DataFrame, host_rules: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Append `robots_authorized` to `batch` (needs `url_domain` and
    `url_path` columns).

    host_rules is broadcast by default (small dimension); the per-URL
    longest-match fold is one aggregation keyed by the batch row, all
    JVM-side.  At very large domain counts (10^8 hosts ⇒ rules table no
    longer broadcastable) pass broadcast=False for a domain-keyed
    shuffle join — same plan otherwise.

    Empty patterns are dropped (parse already skips them; the
    pattern_len > 0 guard keeps a pre-fix host_rules table from denying
    whole hosts via the '' regex — reference se/domain.py:208-210).
    """
    rules = host_rules.filter(
        F.col("kind").isin("allow", "disallow") & (F.col("pattern_len") > 0)
    )
    # Most robots rules are literal path prefixes.  A parsed pattern is
    # literal iff it contains no '.*' (every unescaped '.' comes from
    # the '*'-wildcard conversion) and no trailing '$' anchor — those
    # rules match with a codegen'd startswith on the unescaped prefix,
    # no per-pair regex compile.  Only wildcard/anchored rules keep the
    # rlike fallback (non-foldable pattern ⇒ compiled per pair, bounded
    # by batch × wildcard-rules).
    rules = rules.withColumn(
        "_lit", ~F.col("pattern").contains(".*") & ~F.col("pattern").endswith("$")
    ).withColumn(
        "_prefix", F.when(F.col("_lit"), F.regexp_replace("pattern", r"\\(.)", "$1"))
    )
    if broadcast:
        rules = F.broadcast(rules)
    joined = batch.select("url", "url_domain", "url_path").join(
        rules, batch["url_domain"] == rules["domain"], "left"
    )
    matched = joined.withColumn(
        "m",
        F.when(F.col("_lit"), F.col("url_path").startswith(F.col("_prefix"))).otherwise(
            F.expr("url_path rlike concat('^', pattern)")
        ),
    )
    verdict = matched.groupBy("url").agg(
        F.max(F.when((F.col("kind") == "disallow") & F.col("m"), F.col("pattern_len"))).alias("dis_len"),
        F.max(F.when((F.col("kind") == "allow") & F.col("m"), F.col("pattern_len"))).alias("allow_len"),
    )
    verdict = verdict.select(
        "url",
        (
            F.col("dis_len").isNull()
            | (F.coalesce(F.col("allow_len"), F.lit(0)) > F.col("dis_len"))
        ).alias("robots_authorized"),
    )
    return batch.join(verdict, "url", "left").fillna({"robots_authorized": True})
