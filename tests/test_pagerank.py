"""PageRank engine vs the numpy golden oracle (the reference's own
verification pattern: compare each technique against a high-precision
with-barrier run, ``main.cxx:191,207``)."""

import numpy as np
import pyarrow as pa
import pytest

import pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build as gb
from pagerank_barrierfree_openmp_dynamic_ray.functions.oracle import pagerank_power
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import PageRankEngine


def _build(tmp_path, src, dst, n, P=3):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, np.uint64)),
                "dst": pa.array(np.asarray(dst, np.uint64)),
            }
        )
    )
    return gb.build_graph(ds, str(tmp_path / "g"), num_partitions=P, n_vertices=n)


def _layout_arrays(layout):
    import pyarrow.parquet as pq

    t = pq.read_table(layout.edges_in)
    return (
        t["src"].to_numpy().astype(np.int64),
        t["dst"].to_numpy().astype(np.int64),
    )


@pytest.fixture(scope="module")
def tiny_engine(ray_session, tiny_graph, tmp_path_factory):
    src, dst, n = tiny_graph
    layout = _build(tmp_path_factory.mktemp("pr"), src, dst, n)
    eng = PageRankEngine(layout, num_cpus_per_actor=0.25)
    yield eng, layout
    eng.shutdown()


@pytest.fixture(scope="module")
def random_engine(ray_session, tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 400
    m = 3000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    layout = _build(tmp_path_factory.mktemp("prr"), src, dst, n, P=4)
    eng = PageRankEngine(layout, num_cpus_per_actor=0.25)
    yield eng, layout
    eng.shutdown()


def test_static_barrier_matches_oracle(tiny_engine):
    eng, layout = tiny_engine
    s, d = _layout_arrays(layout)
    want, want_iters = pagerank_power(s, d, layout.n_vertices)
    res = eng.run(mode="barrier")
    np.testing.assert_allclose(res.ranks, want, atol=1e-6)
    assert abs(res.ranks.sum() - 1.0) < 1e-6
    assert res.iterations == want_iters
    assert res.residual < 1e-10


def test_static_barrier_random_graph(random_engine):
    eng, layout = random_engine
    s, d = _layout_arrays(layout)
    want, _ = pagerank_power(s, d, layout.n_vertices)
    res = eng.run(mode="barrier")
    np.testing.assert_allclose(res.ranks, want, atol=1e-6)


def test_static_barrierfree_same_fixed_point(random_engine):
    """Barrier-free reaches the same fixed point as with-barrier — the
    reference's equivalence claim (README.md:60-63)."""
    eng, layout = random_engine
    s, d = _layout_arrays(layout)
    want, _ = pagerank_power(s, d, layout.n_vertices)
    res = eng.run(mode="barrierfree")
    np.testing.assert_allclose(res.ranks, want, atol=1e-6)
    assert res.iterations <= 500


def test_warm_start_fewer_iterations(random_engine):
    eng, layout = random_engine
    cold = eng.run(mode="barrier")
    warm = eng.run(mode="barrier", q=cold.ranks)
    np.testing.assert_allclose(warm.ranks, cold.ranks, atol=1e-6)
    assert warm.iterations <= 2  # already at the fixed point


def test_partition_count_invariance(ray_session, tiny_graph, tmp_path):
    """Ranks must not depend on the partitioning (bitwise-stable within
    tolerance, SURVEY hard part (b))."""
    src, dst, n = tiny_graph
    results = []
    for P in (1, 2, 5):
        layout = _build(tmp_path / f"p{P}", src, dst, n, P=P)
        eng = PageRankEngine(layout, num_cpus_per_actor=0.25)
        results.append(eng.run(mode="barrier").ranks)
        eng.shutdown()
    np.testing.assert_allclose(results[0], results[1], atol=1e-12)
    np.testing.assert_allclose(results[0], results[2], atol=1e-12)


def test_top_k(random_engine):
    eng, layout = random_engine
    res = eng.run(mode="barrier")
    top = res.top_k(5)
    assert len(top) == 5
    assert top[0][1] == res.ranks.max()


@pytest.fixture(scope="module")
def dead_layout(ray_session, tmp_path_factory):
    """No-self-loop layout with genuine dead ends (vertices 0..49 have no
    out-edges): the `pagerankTeleport` scenario (`src/pagerank.hxx:157-184`)."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    n, m = 300, 1800
    src = rng.integers(50, n, m).astype(np.uint64)  # 0..49 never emit
    dst = rng.integers(0, n, m).astype(np.uint64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    lay = gb.build_graph(ds, str(tmp_path_factory.mktemp("dead") / "g"),
                         num_partitions=3, n_vertices=n, add_loops=False)
    return lay


def test_dead_mode_matches_teleport_oracle(dead_layout):
    s, d = _layout_arrays(dead_layout)
    want, _ = pagerank_power(s, d, dead_layout.n_vertices, dead=True)
    eng = PageRankEngine(dead_layout, num_cpus_per_actor=0.25)
    try:
        res = eng.run(mode="barrier", dead=True)
        np.testing.assert_allclose(res.ranks, want, atol=1e-6)
        assert abs(res.ranks.sum() - 1.0) < 1e-6  # teleport conserves mass
        bf = eng.run(mode="barrierfree", dead=True)
        np.testing.assert_allclose(bf.ranks, want, atol=1e-6)
    finally:
        eng.shutdown()


def test_dead_mode_rejects_frontier(dead_layout):
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import Frontier

    eng = PageRankEngine(dead_layout, num_cpus_per_actor=0.25)
    try:
        with pytest.raises(ValueError, match="frontier"):
            eng.run(mode="barrier", dead=True,
                    frontier=Frontier(old_layout=dead_layout,
                                      del_src=np.array([1]),
                                      ins_src=np.array([2])))
    finally:
        eng.shutdown()


def test_dead_mode_sharded_board(dead_layout):
    """DEAD mode + sharded board: teleport mass combines through the
    coordinator's dead_exchange; same fixed point as the teleport oracle."""
    s, d = _layout_arrays(dead_layout)
    want, _ = pagerank_power(s, d, dead_layout.n_vertices, dead=True)
    eng = PageRankEngine(dead_layout, num_cpus_per_actor=0.25)
    try:
        bf = eng.run(mode="barrierfree", dead=True, board_shards=2)
        np.testing.assert_allclose(bf.ranks, want, atol=1e-6)
    finally:
        eng.shutdown()


def test_float32_rank_dtype(random_engine):
    """TYPE flag (reference compile-time `TYPE`): float32 ranks/shards reach
    the float64 fixed point to ~1e-5 in both protocols, and the engine
    refuses a tolerance float32 cannot express."""
    eng, layout = random_engine
    s, d = _layout_arrays(layout)
    want, _ = pagerank_power(s, d, layout.n_vertices)
    r32 = eng.run(mode="barrier", tol=1e-6, rank_dtype="float32")
    np.testing.assert_allclose(r32.ranks, want, atol=1e-4)
    b32 = eng.run(mode="barrierfree", tol=1e-6, rank_dtype="float32")
    np.testing.assert_allclose(b32.ranks, want, atol=1e-4)
    with pytest.raises(ValueError, match="float32"):
        eng.run(mode="barrier", tol=1e-10, rank_dtype="float32")


def test_init_wave_parity(random_engine, tmp_path_factory):
    """Staggered first-time CSR builds (init_wave < P, non-divisor) must
    yield the identical engine state/result as the all-at-once default —
    the memory guard changes scheduling only, never the pinned CSR."""
    eng, layout = random_engine
    base = eng.run(mode="barrier")
    with pytest.raises(ValueError):
        PageRankEngine(layout, num_cpus_per_actor=0.25, init_wave=0)
    waved = PageRankEngine(layout, num_cpus_per_actor=0.25, init_wave=3)
    try:
        assert waved.owned == eng.owned
        got = waved.run(mode="barrier")
        np.testing.assert_array_equal(got.ranks, base.ranks)
    finally:
        waved.shutdown()
