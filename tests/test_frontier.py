"""URL-seen dedup (Bloom prefilter + exact anti-join), snapshot tables,
admission rules (se/document.py:603-694 semantics)."""

from pyspark.sql import functions as F

from sosse_spark.operators.admission import (
    CollectionPolicy,
    admit_links,
    build_multiline_re,
    route_cross_collection,
)
from sosse_spark.operators.frontier import (
    bloom_build,
    bloom_prefilter,
    urlseen_dedup,
    with_bucket,
)
from sosse_spark.sources.tables import AppendTable, SnapshotTable

N_BUCKETS = 4
CAND_SCHEMA = (
    "url string, collection_id int, crawl_recurse int, disc_order long, "
    "url_domain string, url_path string"
)


def _cands(spark, urls, recurse=0):
    rows = [(u, 1, recurse, i, "h", "/p") for i, u in enumerate(urls)]
    return with_bucket(spark.createDataFrame(rows, CAND_SCHEMA), N_BUCKETS)


def test_bloom_no_false_negatives(spark):
    seen = _cands(spark, [f"http://h/{i}" for i in range(200)])
    bloom = bloom_build(seen, None, m_bits=1 << 16)
    flagged = bloom_prefilter(seen, bloom, m_bits=1 << 16)
    # every seen URL must be flagged maybe_seen (no false negative, ever)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_filters_most_unseen(spark):
    seen = _cands(spark, [f"http://h/{i}" for i in range(200)])
    bloom = bloom_build(seen, None, m_bits=1 << 16)
    unseen = _cands(spark, [f"http://other/{i}" for i in range(200)])
    flagged = bloom_prefilter(unseen, bloom, m_bits=1 << 16)
    fp = flagged.filter(F.col("maybe_seen")).count()
    assert fp < 20, f"false-positive rate too high: {fp}/200"


def test_urlseen_dedup_exact(spark):
    frontier = _cands(spark, ["http://h/a", "http://h/b"]).withColumn(
        "collection_id", F.lit(1)
    )
    bloom = bloom_build(frontier, None, m_bits=1 << 16)
    cands = _cands(spark, ["http://h/a", "http://h/c", "http://h/c", "http://h/d"])
    new = urlseen_dedup(cands, frontier, bloom, m_bits=1 << 16)
    urls = sorted(r["url"] for r in new.collect())
    assert urls == ["http://h/c", "http://h/d"]  # dup-in-batch collapsed too


def test_urlseen_collision_keeps_max_depth(spark):
    """get_or_create collision keeps max(crawl_recurse)
    (se/document.py:692-693)."""
    rows = [
        ("http://h/x", 1, 1, 10, "h", "/x"),
        ("http://h/x", 1, 5, 3, "h", "/x"),
    ]
    cands = with_bucket(spark.createDataFrame(rows, CAND_SCHEMA), N_BUCKETS)
    new = urlseen_dedup(cands, None, None).collect()
    assert len(new) == 1
    assert new[0]["crawl_recurse"] == 5
    assert new[0]["disc_order"] == 3


def test_snapshot_table_commit_resume(spark, tmp_root):
    t = SnapshotTable(tmp_root, "frontier", n_buckets=N_BUCKETS)
    df1 = _cands(spark, [f"http://h/{i}" for i in range(20)])
    t.commit(spark, df1, round_no=0)
    assert t.read(spark).count() == 20
    # second commit touching a subset of buckets
    df2 = _cands(spark, ["http://h/new1", "http://h/new2"])
    touched = {r["bucket"] for r in df2.select("bucket").distinct().collect()}
    merged = t.read(spark).filter(F.col("bucket").isin(list(touched))).unionByName(df2)
    t.commit(spark, merged, round_no=1)
    # resume path: fresh handle reads LATEST
    t2 = SnapshotTable(tmp_root, "frontier", n_buckets=N_BUCKETS)
    assert t2.read(spark).count() == 22
    assert t2.manifest()["round"] == 1
    # untouched buckets still point at snap-000001
    m = t2.manifest()
    assert any(v == "snap-000001" for v in m["buckets"].values())
    assert any(v == "snap-000002" for v in m["buckets"].values())


def test_legacy_blob_bloom_migrates_on_read(spark, tmp_path_factory):
    """Resume over a pre-word-table bloom snapshot (blob format): the
    engine rebuilds the bloom from the frontier (derivable state),
    recommits it word-format across all buckets, and dedup still holds
    — an already-seen URL must not be admitted twice."""
    from datetime import datetime

    from sosse_spark.operators.admission import CollectionPolicy
    from sosse_spark.sources.webgraph import WebConfig, url_of
    from sosse_spark.streaming.crawl_loop import CrawlEngine

    root = str(tmp_path_factory.mktemp("legacy_bloom"))
    web = WebConfig(n_docs=10, n_hosts=2)
    pol = CollectionPolicy(collection_id=1, unlimited_regex=".*", recursion_depth=1)
    eng = CrawlEngine(spark, root, web, pol, n_buckets=4, batch_size=8)
    t0 = datetime(2024, 1, 1)
    eng.seed([url_of(2, web), url_of(4, web)], t0)

    # overwrite the bloom table with a legacy blob-format snapshot
    legacy = spark.createDataFrame(
        [(b, bytes(8), 2) for b in range(4)], "bucket int, blob binary, n bigint"
    )
    eng.bloom.commit(spark, legacy, eng.bloom.manifest()["round"], changed_buckets=list(range(4)))

    eng2 = CrawlEngine(spark, root, web, pol, n_buckets=4, batch_size=8)
    eng2.seed([url_of(2, web), url_of(6, web)], t0)  # url 2 already seen
    f = eng2.frontier.read(spark)
    assert f.filter(F.col("url") == url_of(2, web)).count() == 1  # no dup
    assert f.count() == 3
    b = eng2.bloom.read(spark)
    assert "word" in b.columns and "blob" not in b.columns  # migrated


def test_snapshot_table_rollback_to_round(spark, tmp_root):
    """Crash repair for pre-frontier-commit snapshot tables (the P3
    pending-extern side table): rewind LATEST to the newest snapshot
    whose round predates the replayed round, then recommit in place."""
    t = SnapshotTable(tmp_root, "pend", n_buckets=N_BUCKETS)
    t.commit(spark, _cands(spark, ["http://h/a"]), round_no=0)
    t.commit(spark, _cands(spark, ["http://h/a", "http://h/b"]), round_no=1)
    t.commit(spark, _cands(spark, ["http://h/c"]), round_no=2)
    t.rollback_to_round(2)  # round 2 never reached its frontier commit
    assert t.manifest()["round"] == 1
    urls = {r["url"] for r in t.read(spark).collect()}
    assert "http://h/c" not in urls
    # replay recommits round 2, overwriting the orphaned snapshot
    t.commit(spark, _cands(spark, ["http://h/c2"]), round_no=2)
    assert t.manifest()["round"] == 2
    assert "http://h/c2" in {r["url"] for r in t.read(spark).collect()}
    # rollback past everything removes LATEST entirely
    t.rollback_to_round(0)
    assert t.read(spark) is None


def test_append_table(spark, tmp_root):
    t = AppendTable(tmp_root, "metrics")
    assert t.read(spark) is None
    t.append(spark, spark.createDataFrame([(1,)], "a int"), 0)
    t.append(spark, spark.createDataFrame([(2,)], "a int"), 1)
    assert sorted(r["a"] for r in t.read(spark).collect()) == [1, 2]


def test_append_table_truncate_from(spark, tmp_root):
    """Crash repair: appends from a round that never reached its frontier
    commit are dropped before the round replays (exactly-once)."""
    t = AppendTable(tmp_root, "docs")
    t.append(spark, spark.createDataFrame([(1,)], "a int"), 0)
    t.append(spark, spark.createDataFrame([(2,)], "a int"), 1)
    t.append(spark, spark.createDataFrame([(3,)], "a int"), 1)
    t.truncate_from(1)
    assert [r["a"] for r in t.read(spark).collect()] == [1]
    t.truncate_from(1)  # idempotent
    assert [r["a"] for r in t.read(spark).collect()] == [1]
    t.truncate_from(0)
    assert t.read(spark) is None


def test_build_multiline_re():
    assert build_multiline_re("^http://a/.*\n# comment\n^http://b/.*\n") == "(^http://a/.*|^http://b/.*)"
    assert build_multiline_re("^x$") == "^x$"
    assert build_multiline_re("# only comment\n") == ""


def test_admit_links_depth_budget(spark):
    """unlimited → full depth; limited + parent budget → parent−1;
    no match → dropped; seed → always (se/document.py:603-694)."""
    policy = CollectionPolicy(
        collection_id=1,
        unlimited_regex="^http://img0\\.example\\.com/",
        limited_regex="^http://img1\\.example\\.com/",
        recursion_depth=2,
    )
    rows = [
        ("http://img0.example.com/a", 0),  # unlimited — admitted despite 0 budget
        ("http://img1.example.com/b", 3),  # limited — depth 2
        ("http://img1.example.com/c", 0),  # limited, budget exhausted — dropped
        ("http://img9.example.com/d", 3),  # no match — dropped
        ("http://img9.example.com/seed", None),  # seed — admitted, full depth
    ]
    df = spark.createDataFrame(rows, "url string, parent_recurse int")
    got = {r["url"]: (r["admitted_reason"], r["crawl_recurse"]) for r in admit_links(df, policy).collect()}
    assert got == {
        "http://img0.example.com/a": ("unlimited", 2),
        "http://img1.example.com/b": ("limited", 2),
        "http://img9.example.com/seed": ("seed", 2),
    }


def test_admit_links_exclusions(spark):
    policy = CollectionPolicy(collection_id=1, unlimited_regex=".*", excluded_regex="secret")
    df = spark.createDataFrame(
        [("http://h/ok", 1), ("http://h/secret/x", 1), ("http://h/block-me", 1), ("http://h/pre/fix", 1)],
        "url string, parent_recurse int",
    )
    got = [
        r["url"]
        for r in admit_links(
            df, policy, excluded_exact=["http://h/block-me"], excluded_prefix=["http://h/pre/"]
        ).collect()
    ]
    assert got == ["http://h/ok"]


def test_cross_collection_longest_match_wins(spark):
    """Longest regex match picks the target collection
    (se/collection.py:306-339)."""
    policies = [
        CollectionPolicy(collection_id=1, unlimited_regex="^http://a\\.com/"),
        CollectionPolicy(collection_id=2, unlimited_regex="^http://a\\.com/deep/"),
        CollectionPolicy(collection_id=3, unlimited_regex="^http://b\\.com/"),
    ]
    src = CollectionPolicy(collection_id=9, queue_to_any_collection=True)
    rejected = spark.createDataFrame(
        [("http://a.com/deep/x",), ("http://a.com/shallow",), ("http://c.com/none",)],
        "url string",
    )
    got = {r["url"]: r["collection_id"] for r in route_cross_collection(rejected, policies, src).collect()}
    assert got == {"http://a.com/deep/x": 2, "http://a.com/shallow": 1}


def test_frontier_schema_evolution_on_resume(spark):
    """A snapshot written before a nullable column existed (e.g. `tags`)
    must read back with NULL defaults — resume never requires a table
    rewrite (CrawlEngine._with_schema_defaults)."""
    from pyspark.sql import functions as F

    from sosse_spark.operators.frontier import FRONTIER_SCHEMA
    from sosse_spark.streaming.crawl_loop import CrawlEngine

    assert CrawlEngine._with_schema_defaults(None) is None
    old_cols = [f for f in FRONTIER_SCHEMA.fields if f.name not in ("tags", "payload_date")]
    row = {f.name: None for f in old_cols}
    row.update(url="u", url_hash=1, bucket=0, collection_id=1, id=1,
               manual_crawl=False, retries=0, robotstxt_rejected=False)
    import pyspark.sql.types as T

    df = spark.createDataFrame([tuple(row[f.name] for f in old_cols)], T.StructType(old_cols))
    out = CrawlEngine._with_schema_defaults(df)
    assert set(out.columns) >= {f.name for f in FRONTIER_SCHEMA.fields}
    got = out.select("url", "tags", "payload_date").collect()[0]
    assert got["url"] == "u" and got["tags"] is None and got["payload_date"] is None
    assert dict(out.dtypes)["tags"] == "array<string>"


def test_snapshot_vacuum_keeps_reachable_dirs(spark, tmp_root):
    """vacuum(keep_last=2) removes dirs unreachable from the last two
    manifests and their stale manifests; reads still work afterwards."""
    import os

    t = SnapshotTable(tmp_root, "vac", n_buckets=N_BUCKETS)
    for r in range(5):
        t.commit(spark, _cands(spark, [f"http://h/{r}-{i}" for i in range(4)]), round_no=r)
    before = {n for n in os.listdir(t.dir) if n.startswith("snap-")}
    rows_before = {r["url"] for r in t.read(spark).collect()}
    deleted = t.vacuum(keep_last=2)
    rows_after = {r["url"] for r in t.read(spark).collect()}
    assert rows_after == rows_before  # every live bucket still readable
    after = {n for n in os.listdir(t.dir) if n.startswith("snap-")}
    assert after == before - set(deleted)
    # whatever the last two manifests reference must have survived
    live = set(t.manifest()["buckets"].values()) | set(t.manifest(t.latest() - 1)["buckets"].values())
    assert live <= after


def test_append_vacuum_removes_truncated_orphans(spark, tmp_root):
    import os

    t = AppendTable(tmp_root, "vaclog")
    t.append(spark, spark.createDataFrame([(1,)], "a int"), 0)
    t.append(spark, spark.createDataFrame([(2,)], "a int"), 1)
    t.truncate_from(1)  # drops the round-1 dir from the manifest only
    orphans = t.vacuum()
    assert orphans  # the truncated dir is physically gone now
    assert [r["a"] for r in t.read(spark).collect()] == [1]
    names = set(os.listdir(t.dir))
    assert not any(o in names for o in orphans)
