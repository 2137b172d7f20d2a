"""PageRank over the link graph (Page et al. 1999): hand goldens,
python-replica equality (dangling redistribution, duplicate-edge
votes), and the probability-mass invariant."""

from collections import defaultdict

from sosse_spark.operators.graph import pagerank


def _ref_pagerank(edges, iterations=3, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = defaultdict(int)
    for u, _ in edges:
        outdeg[u] += 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(float)
        for u, v in edges:
            contrib[v] += r[u] / outdeg[u]
        dang = sum(r[v] for v in nodes if outdeg[v] == 0)
        r = {v: (1 - d) / n + d * (contrib[v] + dang / n) for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_hand_golden_triangle_with_dangling(spark):
    # 1 -> 2, 2 -> 1, 2 -> 3; 3 dangles
    edges = [(1, 2), (2, 1), (2, 3)]
    got = _run(spark, edges, iterations=2)
    want = _ref_pagerank(edges, iterations=2)
    assert set(got) == {1, 2, 3}
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_replica_with_duplicates_and_selfloops(spark):
    # deterministic messy graph: duplicate edges vote twice, self-loops
    # allowed, node 0 dangles, node 9 appears only as a destination
    edges = []
    for i in range(1, 8):
        for j in range(1 + i % 3):
            edges.append((i, (i * 3 + j) % 10))
    edges.append((5, 6))
    edges.append((5, 6))  # duplicate
    got = _run(spark, edges, iterations=4)
    want = _ref_pagerank(edges, iterations=4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_checkpoint_every_same_result(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)]
    a = _run(spark, edges, iterations=5)
    b = _run(spark, edges, iterations=5, checkpoint_every=2)
    assert a == b


def _ref_hits(edges, iterations=3):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {v: 1.0 / len(nodes) for v in nodes}
    auth = None
    for _ in range(iterations):
        a = defaultdict(float)
        for u, v in edges:
            a[v] += hub[u]
        za = sum(a.values())
        auth = {v: a[v] / za for v in nodes}
        h = defaultdict(float)
        for u, v in edges:
            h[u] += auth[v]
        zh = sum(h.values())
        hub = {v: h[v] / zh for v in nodes}
    return hub, auth


def test_hits_replica_and_mass(spark):
    from sosse_spark.operators.graph import hits

    edges = []
    for i in range(1, 8):
        for j in range(1 + i % 3):
            edges.append((i, (i * 3 + j) % 10))
    edges.append((5, 6))
    edges.append((5, 6))  # duplicate edge votes twice
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iterations=3).collect()}
    hub, auth = _ref_hits(edges, iterations=3)
    assert set(got) == set(hub)
    for v in hub:
        assert abs(got[v][0] - hub[v]) < 1e-9, ("hub", v)
        assert abs(got[v][1] - auth[v]) < 1e-9, ("auth", v)
    assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-6
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-6
