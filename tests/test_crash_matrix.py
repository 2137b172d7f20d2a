"""Crash-injection matrix: kill run_round immediately AFTER each
side-effecting commit/append, resume with a fresh engine, and require
the final state to be IDENTICAL to an uninterrupted run — the
"kill it anywhere" claim tested at every commit point rather than one.

Invariants exercised per kill point (CLAUDE.md):
  * append tables are round-tagged; _repair truncates the replayed
    round's partial appends (documents/links/metrics/webhooks/favicons)
  * bloom commits BEFORE frontier: a crash in between leaves a superset
    (extra prefilter positives only — the exact anti-join absorbs them)
  * pending_externs commits before frontier; _repair rewinds it
  * the frontier commit is the atomic commit point: after it, the round
    never replays
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from sosse_spark.operators.admission import CollectionPolicy
from sosse_spark.sources.webgraph import WebConfig, url_of
from sosse_spark.streaming.crawl_loop import CrawlEngine

T0 = datetime(2024, 1, 1)
WEB = WebConfig(n_docs=40, n_hosts=4)
POL = CollectionPolicy(
    collection_id=1,
    unlimited_regex=r"^http://img[0-2]\.example\.com/",  # img3 = extern
    recursion_depth=2,
    keep_params=False,
    recrawl_freq="adaptive",
    webhooks=("discovery",),
)
SEEDS = [2, 11, 15, 1]


class _Boom(RuntimeError):
    pass


def _engine(spark, root):
    return CrawlEngine(spark, root, WEB, POL, n_buckets=4, batch_size=12, per_host_budget=6)


def _run_reference(spark, root):
    eng = _engine(spark, root)
    eng.seed([url_of(i, WEB) for i in SEEDS], T0)
    eng.run_round(T0)
    eng.run_round(T0 + timedelta(minutes=1))
    eng.close()
    return eng


def _snapshot_state(spark, eng):
    frontier = {
        tuple(r)
        for r in eng.frontier.read(spark)
        .select("url", "collection_id", "id", "crawl_last", "crawl_next", "retries",
                "content_hash", "redirect_url", "error")
        .collect()
    }
    docs_df = eng.documents.read(spark)
    docs = (
        {tuple(r) for r in docs_df.select("url", "content_hash", "round_no", "phash").collect()}
        if docs_df is not None
        else set()
    )
    lv = eng.links_view()
    links = (
        {tuple(r) for r in lv.select("src_url", "dst_url", "link_no", "is_admitted").collect()}
        if lv is not None
        else set()
    )
    m = eng.metrics.read(spark)
    metrics = (
        {tuple(r) for r in m.select("round_no", "batch", "success", "new_urls").collect()}
        if m is not None
        else set()
    )
    return frontier, docs, links, metrics


# each case: (table attribute, method name, crash_round) — crash right
# AFTER the 1st invocation of that method during that round.  The
# pending-externs commit fires in round 1 (where externs are first
# discovered); everything else is exercised in the recrawl round 2.
KILL_POINTS = [
    ("documents", "append", 2),
    ("links", "append", 2),
    ("pending_externs", "commit", 1),
    ("webhook_events", "append", 2),
    ("bloom", "commit", 2),
    ("metrics", "append", 2),
]


@pytest.fixture(scope="module")
def reference(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crash_ref"))
    eng = _run_reference(spark, root)
    return _snapshot_state(spark, eng)


@pytest.mark.parametrize(
    "table_attr,method,crash_round", KILL_POINTS, ids=[f"{t}.{m}@r{r}" for t, m, r in KILL_POINTS]
)
def test_crash_after_commit_replays_identically(
    spark, tmp_path_factory, reference, table_attr, method, crash_round
):
    root = str(tmp_path_factory.mktemp(f"crash_{table_attr}_{method}"))
    eng = _engine(spark, root)
    eng.seed([url_of(i, WEB) for i in SEEDS], T0)
    crash_t = T0 if crash_round == 1 else T0 + timedelta(minutes=1)
    if crash_round == 2:
        eng.run_round(T0)

    # arm the bomb: crash immediately after the first call
    table = getattr(eng, table_attr)
    original = getattr(table, method)

    def exploding(*args, **kwargs):
        out = original(*args, **kwargs)
        raise _Boom(f"crash after {table_attr}.{method}")

    setattr(table, method, exploding)
    with pytest.raises(_Boom):
        eng.run_round(crash_t)
    setattr(table, method, original)
    eng.close()

    # resume: a FRESH engine repairs and replays the crashed round,
    # then completes the schedule
    eng2 = _engine(spark, root)
    m = eng2.run_round(crash_t)
    assert m is not None and m["round_no"] == crash_round
    if crash_round == 1:
        eng2.run_round(T0 + timedelta(minutes=1))
    got = _snapshot_state(spark, eng2)
    names = ("frontier", "documents", "links_view", "metrics")
    for name, g, want in zip(names, got, reference):
        assert g == want, f"{name} diverged after crash at {table_attr}.{method}"
    eng2.close()


def test_crash_after_frontier_commit_does_not_replay(spark, tmp_path_factory, reference):
    """After the frontier commit the round is DONE — a crash there must
    not replay it (metrics/documents would double otherwise)."""
    root = str(tmp_path_factory.mktemp("crash_post_frontier"))
    eng = _engine(spark, root)
    eng.seed([url_of(i, WEB) for i in SEEDS], T0)
    eng.run_round(T0)

    original = eng.frontier.commit

    def exploding(*args, **kwargs):
        out = original(*args, **kwargs)
        raise _Boom("crash after frontier.commit")

    eng.frontier.commit = exploding
    with pytest.raises(_Boom):
        eng.run_round(T0 + timedelta(minutes=1))
    eng.frontier.commit = original
    eng.close()

    eng2 = _engine(spark, root)
    assert eng2.round_no() == 3  # round 2 committed — not replayed
    got = _snapshot_state(spark, eng2)
    for g, want in zip(got, reference):
        assert g == want
    eng2.close()


# --- auth round: the cookies.commit point -----------------------------------
# cookies commit BEFORE the frontier commit and are NOT rolled back on
# replay (crawl_loop.py init note): a crash after cookies.commit replays
# the round with the session cookie pre-loaded — the direct cookie-bearing
# fetch must yield a state identical to the uncrashed auth+refetch path.

from sosse_spark.sources.webgraph import AUTH_PASSWORD  # noqa: E402

WEB_AUTH = WebConfig(n_docs=60, n_hosts=6, zipf_alpha=1.0, private_mod=5, auth_host_mod=2)
POL_AUTH = CollectionPolicy(
    collection_id=1,
    unlimited_regex=r"^http://img[0-9]+\.example\.com/",
    recursion_depth=2,
    keep_params=False,
    recrawl_freq="adaptive",
    auth_login_url_re=r"/login",
    auth_fields=(("user", "admin"), ("password", AUTH_PASSWORD)),
)
AUTH_SEEDS = [10, 4]  # private doc on auth host 1 + a public doc


def _auth_engine(spark, root):
    return CrawlEngine(
        spark, root, WEB_AUTH, POL_AUTH, n_buckets=4, batch_size=16, per_host_budget=8
    )


def _auth_state(spark, eng):
    jar_df = eng.cookies.read(spark)
    jar = (
        {tuple(r) for r in jar_df.select("domain", "name", "value", "path").collect()}
        if jar_df is not None
        else set()
    )
    return _snapshot_state(spark, eng) + (jar,)


@pytest.fixture(scope="module")
def auth_reference(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crash_auth_ref"))
    eng = _auth_engine(spark, root)
    eng.seed([url_of(i, WEB_AUTH) for i in AUTH_SEEDS], T0)
    eng.run_round(T0)
    eng.close()
    return _auth_state(spark, eng)


@pytest.mark.parametrize("table_attr", ["cookies", "bloom"])
def test_crash_in_auth_round_replays_identically(
    spark, tmp_path_factory, auth_reference, table_attr
):
    """Kill after cookies.commit (replay re-auths nothing: the persisted
    cookie short-circuits the login wall) and after bloom.commit (cookie
    already durable, crash later in the round) — both replays must equal
    the uncrashed run, jar included."""
    root = str(tmp_path_factory.mktemp(f"crash_auth_{table_attr}"))
    eng = _auth_engine(spark, root)
    eng.seed([url_of(i, WEB_AUTH) for i in AUTH_SEEDS], T0)

    table = getattr(eng, table_attr)
    original = table.commit

    def exploding(*args, **kwargs):
        out = original(*args, **kwargs)
        raise _Boom(f"crash after {table_attr}.commit")

    table.commit = exploding
    with pytest.raises(_Boom):
        eng.run_round(T0)
    table.commit = original
    eng.close()

    eng2 = _auth_engine(spark, root)
    m = eng2.run_round(T0)
    assert m is not None and m["round_no"] == 1 and m["errors"] == 0
    got = _auth_state(spark, eng2)
    names = ("frontier", "documents", "links_view", "metrics", "cookie_jar")
    for name, g, want in zip(names, got, auth_reference):
        assert g == want, f"{name} diverged after crash at {table_attr}.commit"
    eng2.close()
