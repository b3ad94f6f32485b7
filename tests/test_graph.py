"""Integer PageRank (`operators/graph.py`): exactness against an
independently written plain-Python implementation of the same
recurrence, closeness to the classic float PageRank it discretizes,
partitioning invariance (the whole point of integer arithmetic), and
the directed/dangling contracts."""

from __future__ import annotations

import pytest

from purpleair_data_logger_spark.operators.graph import pagerank

#          1 -- 2
#          |    |
#          4 -- 3 -- 5        (5 is a leaf; 3 is the hub)
EDGES = [(1, 2), (2, 3), (3, 4), (4, 1), (3, 5)]


def _py_pagerank(edges, *, n_iter=8, damping_pct=85, scale=10**9,
                 directed=False):
    """Independent reference: same integer recurrence, plain dicts."""
    e = set(edges)
    if not directed:
        e |= {(v, u) for u, v in edges}
    out = {}
    for u, v in e:
        out.setdefault(u, set()).add(v)
    nodes = {n for uv in e for n in uv}
    rank = {n: scale for n in nodes}
    teleport = scale * (100 - damping_pct) // 100
    for _ in range(n_iter):
        contrib = {n: 0 for n in nodes}
        for u, dsts in out.items():
            share = rank[u] // len(dsts)
            for v in dsts:
                contrib[v] += share
        rank = {n: teleport + (contrib[n] * damping_pct) // 100
                for n in nodes}
    return rank


def _py_float_pagerank(edges, *, n_iter=60, d=0.85):
    e = set(edges) | {(v, u) for u, v in edges}
    out = {}
    for u, v in e:
        out.setdefault(u, set()).add(v)
    nodes = {n for uv in e for n in uv}
    rank = {n: 1.0 for n in nodes}
    for _ in range(n_iter):
        contrib = {n: 0.0 for n in nodes}
        for u, dsts in out.items():
            for v in dsts:
                contrib[v] += rank[u] / len(dsts)
        rank = {n: (1 - d) + d * contrib[n] for n in nodes}
    return rank


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, "src", "dst", **kw).collect()}


def test_pagerank_matches_python_reference_exactly(spark):
    got = _run(spark, EDGES, n_iter=8)
    assert got == _py_pagerank(EDGES, n_iter=8)


def test_pagerank_approximates_float_pagerank(spark):
    """The integer recurrence IS PageRank: at the converged float
    fixpoint each node's scaled rank sits within DIV-truncation noise
    (well under 1% here)."""
    got = _run(spark, EDGES, n_iter=40)
    ref = _py_float_pagerank(EDGES)
    for n, r in ref.items():
        assert got[n] / 1e9 == pytest.approx(r, rel=0.01)
    # the hub outranks everyone; the leaf ranks lowest
    assert max(got, key=got.get) == 3
    assert min(got, key=got.get) == 5


def test_pagerank_partitioning_invariance(spark):
    """Bit-identical ranks regardless of input partitioning — the
    float-sum hazard integer arithmetic exists to remove."""
    df1 = spark.createDataFrame(EDGES, "src long, dst long").repartition(1)
    df7 = spark.createDataFrame(EDGES, "src long, dst long").repartition(7)
    r1 = {r["node"]: r["rank"] for r in pagerank(df1, "src", "dst").collect()}
    r7 = {r["node"]: r["rank"] for r in pagerank(df7, "src", "dst").collect()}
    assert r1 == r7


def test_pagerank_directed_dangling_leaks_mass(spark):
    """directed=True keeps orientation: a sink node (no out-edges)
    receives mass but redistributes none — total mass decays while
    every rank stays exact vs the reference."""
    edges = [(1, 2), (2, 3), (1, 3)]  # 3 is a pure sink
    got = _run(spark, edges, n_iter=5, directed=True)
    assert got == _py_pagerank(edges, n_iter=5, directed=True)
    assert sum(got.values()) < 3 * 10**9  # leaked, not conserved
    assert got[3] > got[2] > got[1]


def test_pagerank_rejects_bad_damping(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(df, "src", "dst", damping_pct=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(df, "src", "dst", damping_pct=100)


def test_triangle_stats_hand_graph(spark):
    """triangle_stats on a hand-checkable graph: K4 plus a pendant
    node — 4 triangles (every 3-subset of the K4), 4+3+3+3+1... wedges
    computed from degrees, gcc = 3T/W; duplicate/reversed/self-loop
    edges collapse first."""
    from purpleair_data_logger_spark.operators.graph import triangle_stats

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    noisy = k4 + [(2, 1), (3, 3), (4, 5)] + k4[:2]  # dup/rev/self/pendant
    df = spark.createDataFrame(noisy, "src long, dst long")
    row = triangle_stats(df, "src", "dst").collect()[0]
    # degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 1
    # wedges = 3*C(3,2) + C(4,2) + C(1,2) = 3*3 + 6 + 0 = 15
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["n_wedges"] == 15
    assert row["n_triangles"] == 4
    assert row["gcc_ppm"] == (3 * 4 * 1_000_000) // 15
    assert row["gcc"] == pytest.approx(12 / 15)


def test_triangle_stats_triangle_free(spark):
    """A star has wedges but zero triangles; a path likewise —
    the closure probe must not fabricate counts."""
    from purpleair_data_logger_spark.operators.graph import triangle_stats

    star = [(0, i) for i in range(1, 6)]
    row = triangle_stats(
        spark.createDataFrame(star, "src long, dst long"), "src", "dst"
    ).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 10  # C(5,2) at the hub
    assert row["gcc_ppm"] == 0
