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


def test_bfs_hops_hand_graph(spark):
    """bfs_hops on a path-plus-branch graph: exact min-hop distances,
    multi-source takes the MINIMUM over sources, unreached nodes are
    absent, early exit beats the hop cap."""
    from purpleair_data_logger_spark.operators.graph import bfs_hops

    #  1-2-3-4-5   6-7 (disconnected)   3-8 (branch)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (3, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    src = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(df, "src", "dst", src, "node", max_hops=12).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 8: 3, 5: 4}  # 6,7 unreachable
    # multi-source: adding source 5 halves distances from the right
    src2 = spark.createDataFrame([(1,), (5,)], "node long")
    got2 = {
        r["node"]: r["hops"]
        for r in bfs_hops(df, "src", "dst", src2, "node").collect()
    }
    assert got2 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2, 8: 3}
    # hop cap truncates the settled set
    capped = {
        r["node"]: r["hops"]
        for r in bfs_hops(df, "src", "dst", src, "node", max_hops=2).collect()
    }
    assert capped == {1: 0, 2: 1, 3: 2}


def test_bfs_directed_respects_orientation(spark):
    from purpleair_data_logger_spark.operators.graph import bfs_hops

    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    src = spark.createDataFrame([(3,)], "node long")
    und = {
        r["node"]: r["hops"]
        for r in bfs_hops(df, "src", "dst", src, "node").collect()
    }
    assert und == {3: 0, 2: 1, 1: 2}
    dird = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            df, "src", "dst", src, "node", directed=True
        ).collect()
    }
    assert dird == {3: 0}  # nothing downstream of the sink


def test_pagerank_overflow_contract_executable(spark):
    """The documented overflow contract (scale*N*damping < 2^63) is
    executable: INSIDE the bound a star graph — the worst case, all
    mass at the hub — computes exact ranks; pushed OUTSIDE the bound
    the engine fails LOUD (ANSI overflow error), never silently
    wrapping (the test_overflow_contracts discipline)."""
    from pyspark.errors.exceptions.captured import (
        ArithmeticException,
        SparkRuntimeException,
    )

    from purpleair_data_logger_spark.operators.graph import pagerank

    star = [(0, i) for i in range(1, 5)]  # N = 5 nodes
    df = spark.createDataFrame(star, "src long, dst long")
    # Inside: scale*N*85 ≈ 8.5e17*5... choose scale 2e16 -> 8.5e18 < 2^63
    safe = {
        r["node"]: r["rank"]
        for r in pagerank(df, "src", "dst", n_iter=3, scale=2 * 10**16).collect()
    }
    assert safe[0] > safe[1] > 0  # hub dominates, all positive
    # Outside: scale*N*85 > 2^63 — the damped multiply must overflow
    # LOUDLY under ANSI mode (or, if ANSI is off in this session,
    # skip — the contract is then purely documented).
    ansi = spark.conf.get("spark.sql.ansi.enabled", "true")
    if ansi != "true":
        import pytest as _pytest

        _pytest.skip("ANSI off: overflow contract is documented-only")
    import pytest as _pytest

    with _pytest.raises((ArithmeticException, SparkRuntimeException, Exception)) as ei:
        pagerank(df, "src", "dst", n_iter=40, scale=4 * 10**17).collect()
    assert "overflow" in str(ei.value).lower() or "ARITHMETIC" in str(ei.value)


def _py_kcore(edges, k):
    """Independent reference: naive peeling with dicts."""
    adj: dict[int, set] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return set(adj)


def test_kcore_hand_graph_and_reference(spark):
    """kcore: K5 with pendant chains — the 4-core is exactly the K5;
    the 2-core keeps the attached cycle but strips the tail; matches
    the independent peeling reference on a composite graph."""
    from purpleair_data_logger_spark.operators.graph import kcore

    k5 = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    cycle = [(10, 11), (11, 12), (12, 10), (5, 10)]  # cycle hangs off K5
    tail = [(1, 20), (20, 21), (21, 22)]
    edges = k5 + cycle + tail
    df = spark.createDataFrame(edges, "src long, dst long")
    run = lambda kk: {
        r["node"] for r in kcore(df, "src", "dst", k=kk).collect()
    }
    assert run(4) == {1, 2, 3, 4, 5}
    assert run(2) == {1, 2, 3, 4, 5, 10, 11, 12}  # tail peels, cycle stays
    assert run(2) == _py_kcore(edges, 2)
    assert run(4) == _py_kcore(edges, 4)
    assert run(6) == set() == _py_kcore(edges, 6)  # K5 max degree is 4


def test_kcore_max_iter_raises_on_long_chain(spark):
    from purpleair_data_logger_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(12)]  # peels one end per round
    df = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, "src", "dst", k=2, max_iter=2)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_kcore_copurchase_gate_row_not_vacuous(spark, sf_dir):
    """r9 VERDICT #1: the old k=4 gate row returned 0 rows at sf0.01,
    so the driver's rows-only check proved only that peeling didn't
    crash ('empty core' and 'broken peel' are indistinguishable at
    0 rows). k=3 has a non-trivial core at every test SF — pin
    non-emptiness so the gate row can never go vacuous again."""
    import os

    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    from purpleair_data_logger_spark.catalog import all_queries

    n = all_queries()["kcore_copurchase"].fn(spark, sf_dir).count()
    assert n > 0, f"kcore_copurchase vacuous ({n} rows) at {sf_dir}"


def test_shortest_paths_hand_graph_vs_dijkstra(spark):
    """shortest_paths on a weighted graph where the cheapest route is
    NOT the fewest-hop route, checked against an independent plain-
    Python Dijkstra; multi-source takes the minimum over sources;
    unreached nodes are absent."""
    import heapq

    from purpleair_data_logger_spark.operators.graph import shortest_paths

    # 1-2-3-4 is a cheap chain (1 each); the 1-4 shortcut costs 5, so
    # the 3-hop route (cost 3) beats the 1-hop route. 6-7 disconnected.
    edges = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 5), (6, 7, 2)]

    def dijkstra(srcs):
        adj = {}
        for u, v, w in edges:
            adj.setdefault(u, []).append((v, w))
            adj.setdefault(v, []).append((u, w))
        dist, heap = {}, [(0, s) for s in srcs]
        while heap:
            d, n = heapq.heappop(heap)
            if n in dist:
                continue
            dist[n] = d
            for v, w in adj.get(n, []):
                if v not in dist:
                    heapq.heappush(heap, (d + w, v))
        return dist

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    for srcs in ([1], [1, 7]):
        sdf = spark.createDataFrame([(s,) for s in srcs], "node long")
        got = {
            r["node"]: r["dist"]
            for r in shortest_paths(
                df, "src", "dst", "w", sdf, "node"
            ).collect()
        }
        assert got == dijkstra(srcs)
    # the distinctive weighted fact: dist(4) == 3 via the chain, not 5
    sdf = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths(df, "src", "dst", "w", sdf, "node").collect()
    }
    assert got[4] == 3


def test_shortest_paths_directed_and_parallel_edges(spark):
    from purpleair_data_logger_spark.operators.graph import shortest_paths

    # parallel 1->2 edges keep the cheapest; orientation respected
    edges = [(1, 2, 9), (1, 2, 4), (2, 3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    src = spark.createDataFrame([(1,)], "node long")
    dird = {
        r["node"]: r["dist"]
        for r in shortest_paths(
            df, "src", "dst", "w", src, "node", directed=True
        ).collect()
    }
    assert dird == {1: 0, 2: 4, 3: 5}
    # directed from the sink reaches nothing
    src3 = spark.createDataFrame([(3,)], "node long")
    assert {
        r["node"]: r["dist"]
        for r in shortest_paths(
            df, "src", "dst", "w", src3, "node", directed=True
        ).collect()
    } == {3: 0}


def test_shortest_paths_rejects_nonpositive_weight(spark):
    from purpleair_data_logger_spark.operators.graph import shortest_paths

    df = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 0)], "src long, dst long, w long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(Exception, match="positive"):
        shortest_paths(df, "src", "dst", "w", src, "node").collect()


def test_shortest_paths_rejects_fractional_weight(spark):
    """ADVICE r10: cast('long') used to silently truncate 1.5 -> 1,
    changing path costs — fractional weights must raise instead."""
    from purpleair_data_logger_spark.operators.graph import shortest_paths

    df = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.5)], "src long, dst long, w double"
    )
    src = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(Exception, match="integral"):
        shortest_paths(df, "src", "dst", "w", src, "node").collect()


def test_shortest_paths_rejects_null_weight(spark):
    """ADVICE r10: a NULL weight on a real edge used to silently drop
    the edge — it must raise (a cost-less edge is a data error)."""
    from purpleair_data_logger_spark.operators.graph import shortest_paths

    df = spark.createDataFrame(
        [(1, 2, 1), (2, 3, None)], "src long, dst long, w long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(Exception, match="NULL weight"):
        shortest_paths(df, "src", "dst", "w", src, "node").collect()


def test_shortest_paths_null_endpoint_rows_still_dropped(spark):
    """Rows with a NULL endpoint carry no edge identity and are dropped
    silently even when their weight is NULL too — the weight raise is
    scoped to REAL edges."""
    from purpleair_data_logger_spark.operators.graph import shortest_paths

    df = spark.createDataFrame(
        [(1, 2, 1), (None, 3, None), (2, None, None)],
        "src long, dst long, w long",
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths(df, "src", "dst", "w", src, "node").collect()
    }
    assert got == {1: 0, 2: 1}


def test_shortest_paths_max_rounds_raises(spark):
    from purpleair_data_logger_spark.operators.graph import shortest_paths

    chain = [(i, i + 1, 1) for i in range(1, 8)]
    df = spark.createDataFrame(chain, "src long, dst long, w long")
    src = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(RuntimeError, match="did not converge"):
        shortest_paths(df, "src", "dst", "w", src, "node", max_rounds=2)
