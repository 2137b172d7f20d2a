"""Form-auth crawl e2e — mirrors the reference auth flow
(se/collection.py:347-365 url_get + se/browser_request.py:242-287
try_auth): a fetch redirected to the login page triggers form POST with
Collection authfields, the session cookie lands in the jar, the original
URL is refetched in-round, and later rounds send the persisted cookie.

Web topology: zipf_alpha=1 spreads docs across hosts; auth_host_mod=2
gates /private/ on odd hosts (never robots hosts, which are host%4==0).
Doc 10 is private on auth host 1 (see webgraph.host_no arithmetic).
"""

from datetime import datetime, timedelta

from sosse_spark.operators.admission import CollectionPolicy
from sosse_spark.sources.corpus import caption_for
from sosse_spark.sources.webgraph import (
    AUTH_COOKIE,
    AUTH_PASSWORD,
    WebConfig,
    host_no,
    url_of,
)
from sosse_spark.streaming.crawl_loop import CrawlEngine

WEB = WebConfig(n_docs=60, n_hosts=6, zipf_alpha=1.0, private_mod=5, auth_host_mod=2)
PRIVATE_I = 10  # private doc on auth host 1
assert PRIVATE_I % WEB.private_mod == 0 and host_no(PRIVATE_I, WEB) == 1

_BASE = dict(
    collection_id=1,
    unlimited_regex=r"^http://img[0-9]+\.example\.com/",
    recursion_depth=2,
    keep_params=False,
    recrawl_freq="adaptive",
)
AUTH_POL = CollectionPolicy(
    **_BASE,
    auth_login_url_re=r"/login",
    auth_fields=(("user", "admin"), ("password", AUTH_PASSWORD)),
)
T0 = datetime(2024, 1, 1)


def _engine(spark, root, pol):
    return CrawlEngine(spark, root, WEB, pol, n_buckets=4, batch_size=16, per_host_budget=8)


def test_auth_round_trip_and_cookie_persist(spark, tmp_root):
    eng = _engine(spark, tmp_root, AUTH_POL)
    url = url_of(PRIVATE_I, WEB)
    eng.seed([url, url_of(4, WEB)], T0)
    m = eng.run_round(T0)
    assert m["errors"] == 0

    # the private payload was crawled THIS round (auth + refetch in-round)
    docs = eng.documents.read(spark).filter(f"url = '{url}'").collect()
    assert len(docs) == 1
    assert docs[0]["caption"] == caption_for(PRIVATE_I)

    # the session cookie landed in the jar as a host-only cookie
    jar = eng.cookies.read(spark).collect()
    assert len(jar) == 1
    c = jar[0]
    assert c["name"] == AUTH_COOKIE
    assert c["value"] == "tok1"
    assert c["domain"] == "img1.example.com"
    assert c["inc_subdomain"] is False
    assert c["path"] == "/"

    # frontier row is a clean success
    row = eng.frontier.read(spark).filter(f"url = '{url}'").collect()[0]
    assert row["error"] is None and row["content_hash"] is not None

    # --- recrawl uses the persisted cookie: no new auth, no jar commit ---
    jar_snap = eng.cookies.latest()
    eng2 = _engine(spark, tmp_root, AUTH_POL)  # resume path reads the jar
    m2 = eng2.run_round(T0 + timedelta(hours=3))
    assert m2 is not None and m2["errors"] == 0
    assert eng2.cookies.latest() == jar_snap  # nothing re-set ⇒ no commit
    docs2 = eng2.documents.read(spark).filter(f"url = '{url}'").collect()
    assert len(docs2) == 2  # recrawled with the cookie, payload identical
    assert docs2[0]["caption"] == docs2[1]["caption"] == caption_for(PRIVATE_I)


def test_unauthenticated_crawl_hits_login_wall(spark, tmp_root):
    # no auth config: the private URL records a redirect to the login
    # page; the queued login page fetches as a payload-less page
    eng = _engine(spark, tmp_root, CollectionPolicy(**_BASE))
    url = url_of(PRIVATE_I, WEB)
    eng.seed([url], T0)
    eng.run_round(T0)
    row = eng.frontier.read(spark).filter(f"url = '{url}'").collect()[0]
    assert row["redirect_url"] is not None and "/login" in row["redirect_url"]
    assert eng.documents.read(spark) is None or (
        eng.documents.read(spark).filter(f"url = '{url}'").count() == 0
    )
    assert eng.cookies.read(spark) is None

    # the redirect target (login page) was queued and crawls cleanly
    m2 = eng.run_round(T0 + timedelta(minutes=1))
    assert m2 is not None and m2["errors"] == 0
    login_rows = eng.frontier.read(spark).filter("url like '%/login%'").collect()
    assert len(login_rows) == 1 and login_rows[0]["error"] is None


def test_wrong_credentials_capture_auth_error(spark, tmp_root):
    pol = CollectionPolicy(
        **_BASE,
        auth_login_url_re=r"/login",
        auth_fields=(("user", "admin"), ("password", "wrong")),
    )
    eng = _engine(spark, tmp_root, pol)
    url = url_of(PRIVATE_I, WEB)
    eng.seed([url], T0)
    m = eng.run_round(T0)
    assert m["errors"] == 1
    row = eng.frontier.read(spark).filter(f"url = '{url}'").collect()[0]
    # distinct from AuthElemFailed — the reference reserves that name
    # for form-selector failures; a bad-credentials POST just fails to
    # redirect (and must NOT trigger a wasted refetch of the wall)
    assert row["error"] is not None and row["error"].startswith("AuthFailed")
    assert eng.cookies.read(spark) is None


def test_session_cookie_exact_token_match():
    """tok11 must not grant host 1's wall (substring vs exact compare)."""
    from sosse_spark.sources.webgraph import fetch_sim

    url = url_of(PRIVATE_I, WEB)  # private doc on auth host 1
    assert fetch_sim(url, WEB, cookie="sosse_session=tok11").is_login_page
    assert fetch_sim(url, WEB, cookie=None).is_login_page
    ok = fetch_sim(url, WEB, cookie="other=x; sosse_session=tok1")
    assert not ok.is_login_page and ok.doc_index == PRIVATE_I


def test_cross_host_redirect_hits_auth_and_cookie_lands_on_login_host(spark, tmp_root):
    """Doc 11 (host 4) redirects to doc 15 — private on auth host 1.
    The login wall fires on the FINAL doc, and the session cookie must
    be stored under the RESPONDING login host (img1), not the origin
    (img4): origin attribution would clobber jar keys across auth hosts
    and re-auth every round."""
    web = WebConfig(
        n_docs=60, n_hosts=6, zipf_alpha=1.0, private_mod=5,
        redirect_mod=10, auth_host_mod=2,
    )
    assert host_no(11, web) == 4 and host_no(15, web) == 1
    eng = CrawlEngine(spark, tmp_root, web, AUTH_POL, n_buckets=4, batch_size=16, per_host_budget=8)
    eng.seed([url_of(11, web)], T0)
    m1 = eng.run_round(T0)
    assert m1["errors"] == 0
    jar = eng.cookies.read(spark).collect()
    assert [r["domain"] for r in jar] == ["img1.example.com"]  # login host, not img4

    # the redirect target (private doc 15) crawls NEXT round with the
    # persisted cookie — no second auth round-trip
    jar_snap = eng.cookies.latest()
    m2 = eng.run_round(T0 + timedelta(minutes=1))
    assert m2["errors"] == 0
    assert eng.cookies.latest() == jar_snap
    docs = eng.documents.read(spark).collect()
    assert caption_for(15) in {d["caption"] for d in docs}


def test_login_endpoint_edges():
    from sosse_spark.sources.webgraph import auth_required, fetch_sim

    # /login-prefixed paths that are NOT the endpoint stay 404
    on = WebConfig(n_docs=30, n_hosts=4, auth_host_mod=2)
    assert fetch_sim("http://img1.example.com/login-bonus/x", on).error == "404 not found"
    assert fetch_sim("http://img1.example.com/login", on).is_login_page
    # non-auth hosts never gained a phantom /login endpoint: only hosts
    # whose wall exists (auth_required) serve the login page
    assert not auth_required(2, on)
    assert fetch_sim("http://img2.example.com/login", on).error == "404 not found"
    # with the auth surface off, /login does not exist
    off = WebConfig(n_docs=30, n_hosts=4, auth_host_mod=0)
    assert fetch_sim("http://img1.example.com/login", off).error == "404 not found"
    # auth_host_mod=1 gates EVERY host (1 % 1 == 0)
    all_on = WebConfig(n_docs=30, n_hosts=4, auth_host_mod=1)
    assert all(auth_required(h, all_on) for h in range(4))
