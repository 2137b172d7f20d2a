"""P17 webhook delivery state machine (se/webhook.py:119-343).

The reference's Webhook model selects documents (enabled flag, trigger
condition, url/mimetype/title/content multiline regexes — trigger(),
se/webhook.py:200-235), renders a JSON body template with ``${path}``
placeholders over the serialized document (_render_template,
se/webhook.py:263-306), POSTs it, and records a 4-key outcome dict per
webhook into ``doc.webhooks_result`` (send, se/webhook.py:307-343):

  * HTTP response arm: ``{"status_code": int, "status_string": reason,
    "response": text, "error": None}`` — non-2xx is logged but still
    recorded with this shape;
  * transport-exception arm (timeout / connection refused):
    ``{"status_code": None, "status_string": None, "response": None,
    "error": str(e)}``;

and trigger() marks the document failed ("Webhook {name} failed") when
the error arm fired or the status is outside [200, 400)
(se/webhook.py:239-241).

Spark-first shape: webhook SELECTION is pure column algebra (anchored
rlike over the multiline-re compile — no Python in the match path);
only DELIVERY — the unavoidable network side effect — runs in a
mapInPandas kernel over the (doc x matched webhook) rows, the
foreachBatch-style side-effect stage of the round.  The kernel is
transport-INJECTABLE: tests pass a deterministic callable, production
uses the stdlib urllib transport; either way the per-batch loop is
bounded by the crawl batch x len(configs).

Engine extension over the reference: a transport-exception RETRY budget
(``retries`` attempts after the first, exception arm only — an HTTP
status is a definitive answer and is never retried, matching the
reference which records non-2xx without retrying).  The recorded JSON
keeps the reference's exact 4-key shape; attempt count rides in a
separate ``attempts`` column for the metrics table.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sosse_spark.operators.admission import build_multiline_re

__all__ = [
    "WebhookConfig",
    "DELIVERY_SCHEMA",
    "webhook_match_col",
    "match_webhooks",
    "render_body",
    "deliver_webhooks",
    "webhooks_result_col",
]


@dataclass(frozen=True)
class WebhookConfig:
    """≙ Webhook model fields the engine consumes (se/webhook.py:99-193)."""

    name: str
    url: str
    method: str = "post"
    headers: tuple = ()  # ((key, value), ...)
    body_template: str = "{}"  # JSON with ${dotted.path} placeholders
    trigger_condition: str = "manual"  # discovery|change|always|manual
    url_re: str = ".*"  # multiline, '#'-comments allowed
    mimetype_re: str = ".*"
    title_re: str = ".*"
    content_re: str = ".*"
    username: str = ""
    password: str = ""
    enabled: bool = True
    timeout: float = 10.0
    retries: int = 0  # extra attempts on the transport-exception arm


# one row per (doc, webhook) delivery outcome
DELIVERY_SCHEMA = (
    "url string, webhook string, status_code int, status_string string, "
    "response string, error string, attempts int"
)


def _anchored(multiline_pattern: str) -> str:
    """re.match anchors at the start (trigger() uses re.match,
    se/webhook.py:222-234); Spark's rlike searches anywhere — prefix ^."""
    pat = build_multiline_re(multiline_pattern)
    return "^(?:" + pat + ")" if pat else ""


def webhook_match_col(
    cfg: WebhookConfig,
    url: Column,
    mimetype: Column,
    title: Column,
    content: Column,
) -> Column:
    """The reference's per-webhook document filter as ONE boolean column
    (trigger(), se/webhook.py:206-234) — JVM-side rlike, no Python."""
    if not cfg.enabled:
        return F.lit(False)
    cond = F.lit(True)
    for col, pat in (
        (url, cfg.url_re),
        (mimetype, cfg.mimetype_re),
        (title, cfg.title_re),
        (content, cfg.content_re),
    ):
        anchored = _anchored(pat)
        if anchored:
            cond = cond & F.coalesce(col, F.lit("")).rlike(anchored)
        else:
            # empty pattern: re.match("", s) always matches
            cond = cond & F.lit(True)
    return cond


def match_webhooks(
    docs: DataFrame,
    configs: tuple,
    url_col: str = "url",
    mimetype_col: str = "mimetype",
    title_col: str = "title",
    content_col: str = "content",
) -> DataFrame:
    """(doc x matched webhook) rows: docs stacked once per matching
    config, ordered by webhook name (trigger() iterates order_by(name),
    se/webhook.py:206).  Configs are few (an admin-curated list), so
    the union is a constant fan-out; each branch is a pushed-down
    rlike filter over the same scan."""
    parts = []
    for cfg in sorted(configs, key=lambda c: c.name):
        m = webhook_match_col(
            cfg,
            F.col(url_col),
            F.col(mimetype_col),
            F.col(title_col),
            F.col(content_col),
        )
        parts.append(docs.filter(m).withColumn("webhook", F.lit(cfg.name)))
    if not parts:
        return docs.withColumn("webhook", F.lit(None).cast("string")).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_PLACEHOLDER = re.compile(r"\$\{([\w.]+)\}")


def _get_subobject(data, dotted: str):
    """Dotted-path lookup (se/utils.py get_subobject semantics): dict
    keys and list indexes."""
    cur = data
    for part in dotted.split("."):
        if isinstance(cur, dict):
            cur = cur.get(part)
        elif isinstance(cur, (list, tuple)):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return None
        else:
            return None
    return cur


def render_body(doc: dict, body_template: str) -> str:
    """_render_template (se/webhook.py:263-306): parse the template as
    JSON, substitute ``${dotted.path}`` placeholders in every string
    leaf (dicts/lists recursed) with str(doc value), re-serialize."""
    tmpl = json.loads(body_template, strict=False)

    def render(v):
        if isinstance(v, dict):
            return {k: render(x) for k, x in v.items()}
        if isinstance(v, list):
            return [render(x) for x in v]
        if isinstance(v, str):
            return _PLACEHOLDER.sub(lambda m: str(_get_subobject(doc, m.group(1))), v)
        return v

    return json.dumps(render(tmpl))


def _urllib_transport(method: str, url: str, headers: dict, body: str, timeout: float):
    """Default production transport (stdlib-only): returns
    (status_code, reason, text); raises on transport failure — the
    exception arm.  HTTP error statuses are RESPONSES here, not
    exceptions (urllib raises HTTPError on >=400; the reference's
    requests does not — unwrap it)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, data=body.encode("utf-8"), headers=headers, method=method.upper()
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, getattr(resp, "reason", ""), resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as e:  # status response, not transport failure
        return e.code, e.reason, e.read().decode("utf-8", "replace")


def deliver_webhooks(
    matched: DataFrame,
    configs: tuple,
    transport: Optional[Callable] = None,
    doc_columns: tuple = ("url", "title", "content", "mimetype"),
) -> DataFrame:
    """The delivery stage: one attempt-loop per (doc, webhook) row,
    executed executor-side in Arrow batches (the only Python stage —
    it IS the side effect).  Returns DELIVERY_SCHEMA rows with the
    reference's outcome taxonomy:

      * response arm  -> (status_code, status_string, response, NULL)
      * exception arm -> (NULL, NULL, NULL, str(e)) after the retry
        budget is exhausted; transport exceptions retry up to
        cfg.retries extra times, HTTP statuses never retry.

    `transport` is injected for tests (callable with the
    _urllib_transport signature); it must be picklable (module-level
    function or closure over plain data)."""
    cfg_by_name = {c.name: c for c in configs}
    tp = transport or _urllib_transport
    cols = [c for c in doc_columns if c in matched.columns]
    if "webhook" not in matched.columns:
        raise ValueError("deliver_webhooks expects match_webhooks output (webhook column)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                cfg = cfg_by_name[rec["webhook"]]
                headers = {
                    "Accept": "application/json",
                    "Content-Type": "application/json",
                }
                headers.update(dict(cfg.headers))
                if cfg.username and cfg.password:
                    import base64

                    cred = f"{cfg.username}:{cfg.password}".encode()
                    headers["Authorization"] = "Basic " + base64.b64encode(cred).decode()
                body = render_body(rec, cfg.body_template)
                status = reason = text = err = None
                attempts = 0
                for attempt in range(cfg.retries + 1):
                    attempts = attempt + 1
                    try:
                        status, reason, text = tp(
                            cfg.method, cfg.url, headers, body, cfg.timeout
                        )
                        err = None
                        break  # any HTTP status is definitive
                    except Exception as e:  # transport failure: retry arm
                        status = reason = text = None
                        err = str(e)
                rows.append(
                    {
                        "url": rec["url"],
                        "webhook": cfg.name,
                        "status_code": status,
                        "status_string": reason,
                        "response": text,
                        "error": err,
                        "attempts": attempts,
                    }
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "webhook",
                    "status_code",
                    "status_string",
                    "response",
                    "error",
                    "attempts",
                ],
            )
            # nullable int64: object construction then Int64 (the
            # CLAUDE.md mapInPandas rule — plain construction coerces
            # NULL-bearing ints to float64)
            out["status_code"] = pd.array(out["status_code"], dtype="Int64")
            out["attempts"] = pd.array(out["attempts"], dtype="Int64")
            yield out

    return matched.select(*cols, "webhook").mapInPandas(run, DELIVERY_SCHEMA)


def webhooks_result_col(delivered: DataFrame) -> DataFrame:
    """Fold delivery rows into the per-doc ``webhooks_result`` JSON the
    reference stores (doc.webhooks_result[webhook.id] = result,
    se/webhook.py:236-237) plus the document failure flag
    (se/webhook.py:239-241: error arm, or status outside [200, 400)).

    Returns (url, webhooks_result string, webhook_error string) — one
    row per doc; pure JVM aggregation (to_json over a map built with
    map_from_entries after a sort_array for name-deterministic key
    order)."""
    failed = F.col("error").isNotNull() | (
        F.coalesce(F.col("status_code"), F.lit(0)) < 200
    ) | (F.coalesce(F.col("status_code"), F.lit(0)) >= 400)
    per = delivered.select(
        "url",
        F.struct(
            F.col("webhook"),
            F.struct(
                "status_code",
                "status_string",
                "response",
                "error",
            ).alias("result"),
        ).alias("entry"),
        F.when(failed, F.concat(F.lit("Webhook "), F.col("webhook"), F.lit(" failed")))
        .alias("fail_msg"),
    )
    return per.groupBy("url").agg(
        F.to_json(
            F.map_from_entries(F.sort_array(F.collect_list("entry"))),
            # the reference's arms carry explicit nulls ("error": null
            # on success) — keep them in the serialized shape
            {"ignoreNullFields": "false"},
        ).alias("webhooks_result"),
        F.min("fail_msg").alias("webhook_error"),
    )
