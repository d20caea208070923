"""Reachability / affected-traversal vs a driver BFS oracle, and the L1/L2
residual norms (`src/_vector.hxx:264-388`)."""

import numpy as np
import pyarrow as pa
import pytest

import pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build as gb
from pagerank_barrierfree_openmp_dynamic_ray.functions.oracle import pagerank_power
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import PageRankEngine
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.traversal import (
    affected_traversal,
    reachable,
)
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.updates import (
    apply_batch_to_layout,
    generate_batch,
    layout_edge_arrays,
)


def _bfs_oracle(src, dst, n, seeds):
    adj = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, []).append(v)
    seen = set(int(s) for s in seeds if 0 <= s < n)
    stack = list(seen)
    while stack:
        u = stack.pop()
        for v in adj.get(u, ()):
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return np.array(sorted(seen), dtype=np.int64)


@pytest.fixture(scope="module")
def trav_layout(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.default_rng(13)
    n, m = 200, 500  # sparse: interesting reachability structure
    src = rng.integers(0, n, m).astype(np.uint64)
    dst = rng.integers(0, n, m).astype(np.uint64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    lay = gb.build_graph(
        ds, str(tmp_path_factory.mktemp("trav") / "g"), num_partitions=3, n_vertices=n
    )
    return lay


def test_reachable_matches_bfs_oracle(trav_layout):
    s, d = layout_edge_arrays(trav_layout)
    for seeds in ([0], [5, 17], [199]):
        got = reachable(trav_layout, np.array(seeds))
        want = _bfs_oracle(s, d, trav_layout.n_vertices, seeds)
        np.testing.assert_array_equal(got, want)


def test_affected_traversal_superset_of_frontier_rule(trav_layout, tmp_path):
    s0, d0 = layout_edge_arrays(trav_layout)
    n = trav_layout.n_vertices
    ds_, dd_, is_, id_ = generate_batch(s0, d0, n, batch_size=10, seed=3)
    new = apply_batch_to_layout(trav_layout, str(tmp_path / "new"), ds_, dd_, is_, id_)
    aff = affected_traversal(trav_layout, new, ds_, is_)
    # every batch endpoint's out-neighborhood (the Frontier seed rule,
    # `src/pagerank.hxx:386-391`) is inside the traversal-affected set
    s1, d1 = layout_edge_arrays(new)
    seed_nbrs = _bfs_oracle(s1, d1, n, list(ds_) + list(is_))
    assert set(seed_nbrs).issubset(set(aff.tolist()) | set())


def test_l1_l2_norm_convergence(trav_layout):
    s, d = layout_edge_arrays(trav_layout)
    want, _ = pagerank_power(s, d, trav_layout.n_vertices, tol=1e-12)
    eng = PageRankEngine(trav_layout, num_cpus_per_actor=0.25)
    try:
        for norm in ("l1", "l2"):
            res = eng.run(mode="barrier", tol=1e-10, norm=norm)
            assert np.allclose(res.ranks, want, atol=1e-6), norm
        with pytest.raises(ValueError):
            eng.run(mode="barrierfree", norm="l1")
    finally:
        eng.shutdown()


def test_traversal_dynamic_matches_full_recompute(trav_layout, tmp_path):
    """Traversal-variant dynamic PageRank (`src/pagerank.hxx:306-352`):
    warm-start + mark the reachability-closed affected set -> same fixed
    point as a full recompute on the updated graph."""
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import Frontier

    s0, d0 = layout_edge_arrays(trav_layout)
    n = trav_layout.n_vertices
    ds_, dd_, is_, id_ = generate_batch(s0, d0, n, batch_size=10, seed=3)
    new = apply_batch_to_layout(trav_layout, str(tmp_path / "td"),
                                ds_, dd_, is_, id_)
    eng0 = PageRankEngine(trav_layout, num_cpus_per_actor=0.25)
    warm = eng0.run(mode="barrier").ranks
    eng0.shutdown()
    aff = affected_traversal(trav_layout, new, ds_, is_)
    eng = PageRankEngine(new, num_cpus_per_actor=0.25)
    try:
        res = eng.run(mode="barrier", q=warm,
                      frontier=Frontier(trav_layout, ds_, is_, affected=aff))
        full = eng.run(mode="barrier").ranks
        assert res.variant == "traversal"
        np.testing.assert_allclose(res.ranks, full, atol=1e-6)
    finally:
        eng.shutdown()
