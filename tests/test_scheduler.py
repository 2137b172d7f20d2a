"""Priority-queue golden ordering (se/test_crawl_queue.py:27-164 fixture)
+ per-host politeness budget + skew-salted top-k."""

from datetime import datetime

from pyspark.sql import functions as F

from sosse_spark.operators.scheduler import (
    display_queue,
    eligible_filter,
    per_host_topk,
    priority_order_cols,
    select_batch,
)

NOW = datetime(2010, 1, 1)


def _ts(year):
    return datetime(year, 1, 1)


def _frontier(spark):
    """The reference's 13-row scheduler fixture (FIXTURES.md §3,
    se/test_crawl_queue.py:27-125): (label, crawl_last, crawl_next,
    manual, worker_no), ids in insertion order."""
    rows = [
        ("Pending 1", _ts(1998), _ts(2003), False, None),
        ("Pending 2", _ts(1998), _ts(2002), False, None),
        ("Pending - first time 1", None, _ts(2005), False, None),
        ("Pending - first time 2", None, _ts(2004), False, None),
        ("Manual Pending 1", _ts(1998), _ts(2003), True, None),
        ("Manual Pending 2", _ts(1998), _ts(2002), True, None),
        ("Manual Pending - first time 1", None, _ts(2005), True, None),
        ("Manual Pending - first time 2", None, _ts(2004), True, None),
        ("In progress 1", _ts(2002), _ts(2003), False, 1),
        ("In progress 2", _ts(2001), _ts(2003), False, 2),
        ("In progress 3", _ts(1999), _ts(2003), False, 3),
        ("Already crawled 1", _ts(2001), None, False, None),
        ("Already crawled 2", _ts(2000), None, False, None),
    ]
    data = [
        {
            "url": f"http://h{i % 3}.example.com/{label}",
            "label": label,
            "url_domain": f"h{i % 3}.example.com",
            "id": i,
            "crawl_last": last,
            "crawl_next": nxt,
            "manual_crawl": manual,
            "worker_no": worker,
            "retries": 0,
        }
        for i, (label, last, nxt, manual, worker) in enumerate(rows)
    ]
    return spark.createDataFrame(data)


EXPECTED_ORDER = [
    "Manual Pending - first time 2",
    "Manual Pending - first time 1",
    "Manual Pending 2",
    "Manual Pending 1",
    "Pending - first time 2",
    "Pending - first time 1",
    "Pending 2",
    "Pending 1",
]


def test_golden_priority_order(spark):
    df = _frontier(spark)
    got = [
        r["label"]
        for r in df.filter(eligible_filter(F.lit(NOW)))
        .orderBy(*priority_order_cols())
        .collect()
    ]
    assert got == EXPECTED_ORDER


def test_eligibility_excludes(spark):
    df = _frontier(spark)
    labels = {r["label"] for r in df.filter(eligible_filter(F.lit(NOW))).collect()}
    assert not any(lbl.startswith("In progress") for lbl in labels)
    assert not any(lbl.startswith("Already crawled") for lbl in labels)
    # retry budget exceeded rows drop out (se/document.py:840)
    bumped = df.withColumn(
        "retries", F.when(F.col("label") == "Pending 1", F.lit(5)).otherwise(F.lit(0))
    )
    labels = {r["label"] for r in bumped.filter(eligible_filter(F.lit(NOW))).collect()}
    assert "Pending 1" not in labels


def test_select_batch_respects_budget_and_order(spark):
    df = _frontier(spark)
    batch = select_batch(df, F.lit(NOW), batch_size=5, per_host_budget=1).collect()
    assert len(batch) <= 5
    hosts = [r["url_domain"] for r in batch]
    assert len(hosts) == len(set(hosts)), "per-host budget of 1 violated"
    # best-priority row overall must be in the batch
    assert any(r["label"] == "Manual Pending - first time 2" for r in batch)


def test_per_host_topk_salted_matches_exact(spark):
    """Salted two-phase top-k == exact top-k, even on a hot host."""
    rows = [
        {
            "url": f"http://hot.example.com/{i}",
            "url_domain": "hot.example.com" if i < 90 else f"cold{i}.example.com",
            "id": i,
            "manual_crawl": False,
            "crawl_last": None,
            "crawl_next": _ts(2000 + (i % 7)),
            "retries": 0,
            "worker_no": None,
        }
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, url_domain string, id long, manual_crawl boolean, "
        "crawl_last timestamp, crawl_next timestamp, retries int, worker_no int",
    )
    got = per_host_topk(df, "url_domain", priority_order_cols(), k=3, salt_buckets=4)
    hot = sorted(
        r["id"] for r in got.filter(F.col("url_domain") == "hot.example.com").collect()
    )
    # exact: order by crawl_next asc then id — ids with smallest (i%7, i)
    expected = sorted(sorted(range(90), key=lambda i: (i % 7, i))[:3])
    assert hot == expected
    assert got.filter(F.col("url_domain") != "hot.example.com").count() == 10


def test_display_queue_sections(spark):
    df = _frontier(spark)
    out = display_queue(df, F.lit(NOW), size=3)
    sections = {r["queue_section"] for r in out.collect()}
    assert {"pending", "in_progress", "history"} <= sections
    pend = [r["label"] for r in out.filter(F.col("queue_section") == "pending").collect()]
    assert pend == EXPECTED_ORDER[:3]


def test_domain_page_cap_quota_arms(spark):
    """Per-domain cumulative quota: crawled rows always survive (with
    NULL pending_rank), pending rows admit only up to cap − crawled in
    priority order, and an exhausted domain admits none."""
    from datetime import datetime as _dt

    from sosse_spark.operators.scheduler import domain_page_cap

    ts = _dt(2024, 1, 1)
    rows = []
    # domain A: 3 crawled, cap 4 -> 1 pending slot; 3 pending contend
    for i in range(3):
        rows.append(("a.com", 10 + i, False, ts, ts, 0, None))
    rows.append(("a.com", 20, False, None, _dt(2024, 1, 5), 0, None))  # rank 2
    rows.append(("a.com", 21, True, None, _dt(2024, 1, 9), 0, None))   # manual: rank 1
    rows.append(("a.com", 22, False, None, _dt(2024, 1, 2), 0, None))  # rank 3? no: crawl_next asc
    # domain B: no crawled -> 4 slots, 2 pending both admitted
    rows.append(("b.com", 30, False, None, _dt(2024, 1, 2), 0, None))
    rows.append(("b.com", 31, False, None, _dt(2024, 1, 3), 0, None))
    # domain C: 5 crawled >= cap -> pending rejected
    for i in range(5):
        rows.append(("c.com", 40 + i, False, ts, ts, 0, None))
    rows.append(("c.com", 50, False, None, _dt(2024, 1, 2), 0, None))
    df = spark.createDataFrame(
        rows,
        "url_domain string, id long, manual_crawl boolean, "
        "crawl_last timestamp, crawl_next timestamp, retries int, worker_no int",
    )
    out = domain_page_cap(df, cap=4).collect()
    crawled = [r for r in out if r["pending_rank"] is None]
    pending = {r["id"]: r for r in out if r["pending_rank"] is not None}
    assert len(crawled) == 8  # 3 + 5, all kept
    assert all(r["crawl_last"] is not None for r in crawled)
    # a.com: the manual pending row wins the single slot
    assert 21 in pending and pending[21]["pending_rank"] == 1
    assert 20 not in pending and 22 not in pending
    assert pending[21]["domain_crawled"] == 3
    # b.com: both admitted, ordered by crawl_next
    assert pending[30]["pending_rank"] == 1 and pending[31]["pending_rank"] == 2
    assert pending[30]["domain_crawled"] == 0
    # c.com: quota exhausted
    assert 50 not in pending


def test_domain_page_cap_plan_no_cartesian(spark):
    from datetime import datetime as _dt

    from sosse_spark.operators.scheduler import domain_page_cap

    df = spark.createDataFrame(
        [
            (f"d{i % 3}.com", i, False, _dt(2024, 1, 1) if i % 2 else None,
             _dt(2024, 1, 2), 0, None)
            for i in range(30)
        ],
        "url_domain string, id long, manual_crawl boolean, "
        "crawl_last timestamp, crawl_next timestamp, retries int, worker_no int",
    )
    # node walk, not toString grep: conftest caps plan strings at 4096
    # chars, so absent-node asserts on long plans would be vacuous
    root = domain_page_cap(df, cap=5)._jdf.queryExecution().executedPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    kinds = [n.getClass().getSimpleName() for n in walk(root)]
    assert not any("Cartesian" in k for k in kinds)
    assert not any("BroadcastNestedLoop" in k for k in kinds)
