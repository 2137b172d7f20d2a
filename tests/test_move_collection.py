"""Bulk collection move (MoveToCollectionView.form_valid,
se/move_to_collection.py:84-158): move/skip/overwrite/delete_source
conflict semantics as a frontier MERGE, plus the URL-seen interaction —
after a move the old (url, src) identity is free again and a re-seed
admits it through the bloom's exact-anti-join fall-through."""

from datetime import datetime

from sosse_spark.operators.admission import CollectionPolicy
from sosse_spark.sources.webgraph import WebConfig, url_of
from sosse_spark.streaming.crawl_loop import CrawlEngine

T0 = datetime(2024, 1, 1)
WEB = WebConfig(n_docs=30, n_hosts=4)
POL = CollectionPolicy(
    collection_id=1,
    unlimited_regex=r"^http://img[0-9]+\.example\.com/",
    recursion_depth=1,
    keep_params=False,
    recrawl_freq="adaptive",
)


def _keys(spark, eng):
    return {
        (r["url"], r["collection_id"])
        for r in eng.frontier.read(spark).select("url", "collection_id").collect()
    }


def test_move_conflicts_and_urlseen_interaction(spark, tmp_root):
    eng = CrawlEngine(spark, tmp_root, WEB, POL, n_buckets=4, batch_size=8, per_host_budget=8)
    u0, u1, u2 = url_of(2, WEB), url_of(4, WEB), url_of(5, WEB)
    eng.seed([u0, u1, u2], T0)
    eng.run_round(T0)

    # plain move: no conflicts
    c = eng.move_to_collection([u0, u1], 1, 2)
    assert c == {"moved": 2, "skipped": 0, "overwritten": 0, "deleted": 0}
    keys = _keys(spark, eng)
    assert (u0, 2) in keys and (u1, 2) in keys and (u2, 1) in keys
    assert (u0, 1) not in keys

    # the vacated (url, src) identity is admittable again: the bloom
    # still holds the url (superset) but the exact anti-join now passes
    eng.seed([u0], T0)
    assert (u0, 1) in _keys(spark, eng)

    # skip: conflicting url stays in BOTH collections
    c = eng.move_to_collection([u0], 1, 2, conflict="skip")
    assert c == {"moved": 0, "skipped": 1, "overwritten": 0, "deleted": 0}
    keys = _keys(spark, eng)
    assert (u0, 1) in keys and (u0, 2) in keys

    # overwrite: existing dst row deleted, source row moved
    c = eng.move_to_collection([u0], 1, 2, conflict="overwrite")
    assert c == {"moved": 1, "skipped": 0, "overwritten": 1, "deleted": 0}
    keys = _keys(spark, eng)
    assert (u0, 2) in keys and (u0, 1) not in keys
    dups = (
        eng.frontier.read(spark)
        .groupBy("url", "collection_id")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0

    # delete_source: conflicting source row removed, dst untouched
    eng.seed([u0], T0)
    c = eng.move_to_collection([u0], 1, 2, conflict="delete_source")
    assert c == {"moved": 0, "skipped": 0, "overwritten": 0, "deleted": 1}
    keys = _keys(spark, eng)
    assert (u0, 2) in keys and (u0, 1) not in keys
