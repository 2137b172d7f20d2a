"""P17 webhook delivery state machine (operators/webhooks.py vs
se/webhook.py:119-343): selection regexes, body-template rendering,
and the delivery outcome taxonomy — success / HTTP-error / transport-
exception arms, with the engine's retry budget on the exception arm
only."""

import json

import pytest
from pyspark.sql import functions as F

from sosse_spark.operators.webhooks import (
    WebhookConfig,
    deliver_webhooks,
    match_webhooks,
    render_body,
    webhook_match_col,
    webhooks_result_col,
)

# ---------------------------------------------------------------------------
# injectable transports.  Executors cannot import the tests package, so
# functions from THIS module must pickle BY VALUE (module-level defs
# normally pickle by reference -> ModuleNotFoundError in the worker).
import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

_ATTEMPTS: dict = {}


def _tp_ok(method, url, headers, body, timeout):
    return 200, "OK", json.dumps({"echo": json.loads(body), "method": method})


def _tp_by_url(method, url, headers, body, timeout):
    """Stateless dispatch on the webhook URL: the e2e web of endpoints."""
    if "refused" in url:
        raise ConnectionError(f"connection refused: {url}")
    if "slow" in url:
        raise TimeoutError(f"timed out after {timeout}s: {url}")
    if "err500" in url:
        return 500, "Internal Server Error", "boom"
    return 200, "OK", "ok"


def _tp_flaky(method, url, headers, body, timeout):
    """Fails the first two attempts per URL, then succeeds — the
    retry-then-success path (attempt state lives in the worker process;
    one row's attempt loop runs sequentially in one process)."""
    n = _ATTEMPTS.get(url, 0) + 1
    _ATTEMPTS[url] = n
    if n <= 2:
        raise ConnectionError(f"flaky ({n})")
    return 200, "OK", "recovered"


# ---------------------------------------------------------------------------


def _docs(spark, rows=None):
    rows = rows or [
        ("http://a.com/page", "A title", "alpha content", "text/html"),
        ("http://b.org/feed", "B title", "beta content", "application/rss+xml"),
        ("http://c.net/x", "C title", "gamma content", "text/plain"),
    ]
    return spark.createDataFrame(
        rows, "url string, title string, content string, mimetype string"
    )


def test_match_webhooks_regex_selection(spark):
    """trigger()'s four anchored re.match filters (se/webhook.py:222-234),
    multiline with # comments, disabled configs excluded, name order."""
    cfgs = (
        WebhookConfig(name="w2_html", url="http://hook/a", mimetype_re="text/.*"),
        WebhookConfig(
            name="w1_multi",
            url="http://hook/b",
            # multiline: either a.com urls or .net urls; comment ignored
            url_re="# comment line\nhttp://a\\.com/.*\nhttp://.*\\.net/.*",
        ),
        WebhookConfig(name="w3_off", url="http://hook/c", enabled=False),
    )
    m = match_webhooks(_docs(spark), cfgs).select("url", "webhook").collect()
    got = sorted((r["url"], r["webhook"]) for r in m)
    by_hook = {}
    for u, w in got:
        by_hook.setdefault(w, set()).add(u)
    assert by_hook["w1_multi"] == {"http://a.com/page", "http://c.net/x"}
    # text/html and text/plain match text/.*; rss+xml does not (anchored)
    assert by_hook["w2_html"] == {"http://a.com/page", "http://c.net/x"}
    assert "w3_off" not in by_hook


def test_match_anchored_like_re_match(spark):
    """re.match anchors at position 0: a pattern matching mid-string
    must NOT select (rlike alone would)."""
    cfg = WebhookConfig(name="w", url="http://hook", url_re="a\\.com")
    docs = _docs(spark)
    got = match_webhooks(docs, (cfg,)).count()
    assert got == 0  # 'a.com' appears mid-url, but re.match needs prefix
    cfg2 = WebhookConfig(name="w", url="http://hook", url_re="http://a\\.com")
    assert match_webhooks(docs, (cfg2,)).count() == 1


def test_render_body_placeholders():
    """_render_template semantics (se/webhook.py:263-306): ${path}
    substitution in string leaves, nested dicts/lists, dotted paths."""
    doc = {"url": "http://a.com", "title": "T", "meta": {"lang": "en"}}
    tmpl = json.dumps(
        {
            "target": "${url}",
            "labels": ["t=${title}", {"deep": "${meta.lang}"}],
            "n": 3,
        }
    )
    out = json.loads(render_body(doc, tmpl))
    assert out == {
        "target": "http://a.com",
        "labels": ["t=T", {"deep": "en"}],
        "n": 3,
    }


def test_delivery_success_arm(spark):
    cfgs = (WebhookConfig(name="w", url="http://hook/ok", body_template='{"u": "${url}"}'),)
    matched = match_webhooks(_docs(spark), cfgs)
    out = deliver_webhooks(matched, cfgs, transport=_tp_ok).collect()
    assert len(out) == 3
    for r in out:
        assert r["status_code"] == 200
        assert r["status_string"] == "OK"
        assert r["error"] is None
        assert r["attempts"] == 1
        assert json.loads(r["response"])["echo"] == {"u": r["url"]}


def test_delivery_arms_and_no_retry_on_http_status(spark):
    """HTTP error statuses are the RESPONSE arm (recorded, never
    retried — se/webhook.py:324-334); transport exceptions are the
    error arm and consume the retry budget."""
    cfgs = (
        WebhookConfig(name="h500", url="http://hook/err500", retries=3),
        WebhookConfig(name="down", url="http://hook/refused", retries=2),
        WebhookConfig(name="slow", url="http://hook/slow", retries=0),
    )
    docs = _docs(spark, [("http://a.com/p", "t", "c", "text/html")])
    matched = match_webhooks(docs, cfgs)
    rows = {r["webhook"]: r for r in deliver_webhooks(matched, cfgs, transport=_tp_by_url).collect()}
    # HTTP 500: response arm, exactly one attempt despite retries=3
    assert rows["h500"]["status_code"] == 500
    assert rows["h500"]["status_string"] == "Internal Server Error"
    assert rows["h500"]["response"] == "boom"
    assert rows["h500"]["error"] is None
    assert rows["h500"]["attempts"] == 1
    # connection refused: retry budget exhausted -> exception arm
    assert rows["down"]["status_code"] is None
    assert rows["down"]["status_string"] is None
    assert rows["down"]["response"] is None
    assert "refused" in rows["down"]["error"]
    assert rows["down"]["attempts"] == 3  # 1 + 2 retries
    # timeout with no budget: single attempt, timeout arm
    assert "timed out" in rows["slow"]["error"]
    assert rows["slow"]["attempts"] == 1


def test_delivery_retry_then_success(spark):
    cfgs = (WebhookConfig(name="w", url="http://hook/flaky", retries=2),)
    docs = _docs(spark, [("http://a.com/p", "t", "c", "text/html")])
    matched = match_webhooks(docs, cfgs).coalesce(1)
    (row,) = deliver_webhooks(matched, cfgs, transport=_tp_flaky).collect()
    assert row["status_code"] == 200
    assert row["response"] == "recovered"
    assert row["error"] is None
    assert row["attempts"] == 3


def test_webhooks_result_json_reference_shape(spark):
    """The folded per-doc JSON matches doc.webhooks_result: one key per
    webhook, each value the 4-key outcome dict with explicit nulls; the
    doc failure flag fires on the error arm or status outside [200,400)
    (se/webhook.py:236-241)."""
    cfgs = (
        WebhookConfig(name="a_ok", url="http://hook/ok"),
        WebhookConfig(name="b_500", url="http://hook/err500"),
        WebhookConfig(name="c_down", url="http://hook/refused"),
    )
    docs = _docs(spark, [("http://a.com/p", "t", "c", "text/html")])
    delivered = deliver_webhooks(match_webhooks(docs, cfgs), cfgs, transport=_tp_by_url)
    (folded,) = webhooks_result_col(delivered).collect()
    res = json.loads(folded["webhooks_result"])
    assert set(res) == {"a_ok", "b_500", "c_down"}
    assert res["a_ok"] == {
        "status_code": 200,
        "status_string": "OK",
        "response": "ok",
        "error": None,
    }
    assert res["b_500"]["status_code"] == 500 and res["b_500"]["error"] is None
    assert res["c_down"] == {
        "status_code": None,
        "status_string": None,
        "response": None,
        "error": res["c_down"]["error"],
    }
    assert "refused" in res["c_down"]["error"]
    # failure flag: 500 and the exception arm both mark the doc
    assert folded["webhook_error"] in ("Webhook b_500 failed", "Webhook c_down failed")


def test_webhooks_result_success_only_no_error(spark):
    cfgs = (WebhookConfig(name="w", url="http://hook/ok"),)
    docs = _docs(spark, [("http://a.com/p", "t", "c", "text/html")])
    delivered = deliver_webhooks(match_webhooks(docs, cfgs), cfgs, transport=_tp_ok)
    (folded,) = webhooks_result_col(delivered).collect()
    assert folded["webhook_error"] is None
    assert json.loads(folded["webhooks_result"])["w"]["error"] is None


def test_match_is_jvm_side(spark):
    """Selection must stay relational: the matched frame's plan has no
    python/pandas stage (delivery is the ONLY python stage)."""
    cfgs = (WebhookConfig(name="w", url="http://hook", url_re="http://a.*"),)
    plan = (
        match_webhooks(_docs(spark), cfgs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# e2e: delivery inside a crawl round (VERDICT r4 #6 "done" criterion)


def test_crawl_delivers_webhooks_with_retry_then_error(spark, tmp_path_factory):
    """Crawl a small web with two configured webhooks — one healthy, one
    whose endpoint always refuses connections (retries=2): every crawled
    doc's webhooks_result carries the success arm for the healthy hook
    and the exhausted-retry error arm for the dead one; the doc is
    marked 'Webhook ... failed' (se/webhook.py:236-241) and the
    webhook_results log shows attempts == 1 + retries."""
    from datetime import datetime, timedelta

    from sosse_spark.operators.admission import CollectionPolicy
    from sosse_spark.sources.webgraph import WebConfig, url_of
    from sosse_spark.streaming.crawl_loop import CrawlEngine

    web = WebConfig(n_docs=8, n_hosts=2)
    cfgs = (
        WebhookConfig(name="alive", url="http://hook/ok", trigger_condition="always"),
        WebhookConfig(
            name="dead",
            url="http://hook/refused",
            trigger_condition="always",
            retries=2,
        ),
    )
    policy = CollectionPolicy(
        collection_id=1,
        unlimited_regex=r"^http://img[0-9]+\.example\.com/",
        recursion_depth=2,
        keep_params=False,
        webhook_configs=cfgs,
    )
    root = str(tmp_path_factory.mktemp("whcrawl"))
    eng = CrawlEngine(
        spark, root, web, policy, n_buckets=4, batch_size=32,
        per_host_budget=8, webhook_transport=_tp_by_url,
    )
    t0 = datetime(2024, 1, 1)
    eng.seed([url_of(2, web)], t0)
    eng.run_until_quiescent(t0, timedelta(minutes=1), max_rounds=6)

    docs = eng.documents.read(spark).collect()
    assert docs
    for d in docs:
        res = json.loads(d["webhooks_result"])
        assert res["alive"]["status_code"] == 200 and res["alive"]["error"] is None
        assert res["dead"]["status_code"] is None and "refused" in res["dead"]["error"]
        assert d["webhook_error"] == "Webhook dead failed"

    log = eng.webhook_results.read(spark).collect()
    by_hook = {}
    for r in log:
        by_hook.setdefault(r["webhook"], []).append(r)
    # exactly-once: one delivery row per (doc, webhook)
    assert len(by_hook["alive"]) == len(docs)
    assert len(by_hook["dead"]) == len(docs)
    assert all(r["attempts"] == 1 for r in by_hook["alive"])
    assert all(r["attempts"] == 3 for r in by_hook["dead"])  # 1 + 2 retries
    eng.close()
