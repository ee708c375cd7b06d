"""graph.py: distributed connected components + star-edge construction."""

import numpy as np
import pyarrow as pa


def _cc(ray_session, a, b, **kw):
    import ray.data

    from plugin_serdes_ray.pipelines.graph import connected_components

    edges = pa.table({"a": pa.array(a, type=pa.int64()),
                      "b": pa.array(b, type=pa.int64())})
    out = connected_components(ray.data.from_arrow(edges), **kw).take_all()
    return sorted((r["v"], r["component"]) for r in out)


def test_components_paths_rings_and_isolates(ray_session):
    got = _cc(ray_session,
              a=[1, 2, 3, 4, 10, 20, 21, 22],
              b=[2, 3, 4, 5, 11, 21, 22, 20])
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
                   (10, 10), (11, 10), (20, 20), (21, 20), (22, 20)]


def test_components_long_path_converges(ray_session):
    # diameter 12: hash-min needs ~12 rounds; the sum-based convergence
    # check must keep iterating until the min reaches the far end
    n = 13
    got = _cc(ray_session, a=list(range(100, 100 + n - 1)),
              b=list(range(101, 100 + n)))
    assert got == [(100 + i, 100) for i in range(n)]


def test_components_chain_beyond_max_iters(ray_session):
    # diameter 120 chain with max_iters=50: plain hash-min would stop at
    # the iteration cap and silently return un-converged labels; the
    # pointer-jump rows (lbl[lbl[v]] folded in each round) make rounds
    # O(log diameter), so this must fully converge well inside the cap
    n = 121
    got = _cc(ray_session, a=list(range(1000, 1000 + n - 1)),
              b=list(range(1001, 1000 + n)))
    assert got == [(1000 + i, 1000) for i in range(n)]


def test_components_duplicate_and_self_edges(ray_session):
    got = _cc(ray_session, a=[5, 5, 5, 7], b=[6, 6, 5, 7])
    assert got == [(5, 5), (6, 5), (7, 7)]


def test_components_empty_edges(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.graph import connected_components

    edges = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64())})
    out = connected_components(ray.data.from_arrow(edges))
    assert out.count() == 0


def test_star_edges_groups(ray_session):
    import ray.data

    from plugin_serdes_ray.pipelines.graph import star_edges

    kt = pa.table({"key": pa.array(["x", "x", "x", "y", "y", "z"]),
                   "id": pa.array([7, 3, 9, 1, 2, 5], type=pa.int64())})
    got = sorted((r["a"], r["b"]) for r in star_edges(
        ray.data.from_arrow(kt), "key", "id").take_all())
    # per-key star from the min id; singleton key 'z' emits nothing
    assert got == [(1, 2), (3, 7), (3, 9)]


def test_star_edges_compose_with_components(ray_session):
    """Two key relations bridge into one component through a shared id —
    the dedup_clusters_documents query shape in miniature."""
    import ray.data

    from plugin_serdes_ray.pipelines.graph import (connected_components,
                                                   star_edges)

    # relation 1 groups {1,2}, {3,4}; relation 2 groups {2,3}: all one
    # component, labeled 1
    kt = pa.table({
        "key": pa.array(["p1", "p1", "p2", "p2", "b1", "b1"]),
        "id": pa.array([1, 2, 3, 4, 2, 3], type=pa.int64())})
    comp = connected_components(
        star_edges(ray.data.from_arrow(kt), "key", "id"))
    got = sorted((r["v"], r["component"]) for r in comp.take_all())
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1)]


def test_null_endpoints_are_dropped(ray_session):
    """A NULL endpoint must not mint a garbage INT64_MIN vertex (the
    int64 cast would otherwise route through float64 NaN) nor poison
    min-label propagation as the global minimum."""
    import ray.data

    from plugin_serdes_ray.pipelines.graph import (connected_components,
                                                   pagerank, star_edges)

    edges = pa.table({"a": pa.array([1, 2, None, 4], type=pa.int64()),
                      "b": pa.array([2, None, 3, 5], type=pa.int64())})
    got = sorted((r["v"], r["component"]) for r in
                 connected_components(ray.data.from_arrow(edges)).take_all())
    assert got == [(1, 1), (2, 1), (4, 4), (5, 4)]

    pr = pagerank(ray.data.from_arrow(
        edges.rename_columns(["src", "dst"])), iters=3).take_all()
    assert sorted(r["v"] for r in pr) == [1, 2, 4, 5]
    assert all(np.isfinite(r["rank"]) and r["rank"] > 0 for r in pr)

    kt = pa.table({"key": pa.array(["x", "x", "x"]),
                   "id": pa.array([7, None, 3], type=pa.int64())})
    star = sorted((r["a"], r["b"]) for r in star_edges(
        ray.data.from_arrow(kt), "key", "id").take_all())
    assert star == [(3, 7)]


def test_triangle_count_reference(ray_session):
    import itertools

    import numpy as np
    import ray.data

    from plugin_serdes_ray.pipelines.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each vertex in 3), an appendage
    # triangle {4,5,6}, a path 6-7-8 (no triangle), duplicate/reversed/
    # self/null edges that must all be ignored
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    ed = k4 + [(4, 5), (5, 6), (6, 4), (6, 7), (7, 8),
               (2, 1), (3, 3), (1, 2)]
    a = [e[0] for e in ed] + [None]
    b = [e[1] for e in ed] + [9]
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(a, type=pa.int64()),
        "b": pa.array(b, type=pa.int64())})).repartition(3)
    got = {r["v"]: r["n_tri"] for r in triangle_count(ds).take_all()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 4, 5: 1, 6: 1}

    # brute-force cross-check on a pseudo-random graph
    rng = np.random.default_rng(11)
    m = rng.integers(0, 12, size=(40, 2))
    ds2 = ray.data.from_arrow(pa.table({
        "a": pa.array(m[:, 0]), "b": pa.array(m[:, 1])})).repartition(4)
    es = {(min(x, y), max(x, y)) for x, y in m if x != y}
    want = {}
    for x, y, z in itertools.combinations(sorted({v for e in es for v in e}), 3):
        if (x, y) in es and (x, z) in es and (y, z) in es:
            for v in (x, y, z):
                want[v] = want.get(v, 0) + 1
    got2 = {r["v"]: r["n_tri"] for r in triangle_count(ds2).take_all()}
    assert got2 == want

    # degenerate graphs: empty, single edge, triangle-free path
    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64())})
    assert triangle_count(ray.data.from_arrow(empty)).take_all() == []
    path = pa.table({"a": pa.array([1, 2], type=pa.int64()),
                     "b": pa.array([2, 3], type=pa.int64())})
    assert triangle_count(ray.data.from_arrow(path)).take_all() == []
