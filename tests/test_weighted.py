"""Weighted graphs: duplicate links sum, weighted degrees, weighted PageRank
(the reference's weighted read path, `src/mtx.hxx:68-72`)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build as gb
from pagerank_barrierfree_openmp_dynamic_ray.functions.oracle import pagerank_power
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import PageRankEngine

N = 120


def _wds(src, dst, w):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, np.uint64)),
                "dst": pa.array(np.asarray(dst, np.uint64)),
                "w": pa.array(np.asarray(w, np.float64)),
            }
        )
    )


@pytest.fixture(scope="module")
def wlayout(ray_session, tmp_path_factory):
    rng = np.random.default_rng(17)
    m = 900
    src = rng.integers(0, N, m)
    dst = rng.integers(0, N, m)
    w = rng.integers(1, 5, m).astype(np.float64)
    lay = gb.build_graph(
        _wds(src, dst, w), str(tmp_path_factory.mktemp("wg") / "g"),
        num_partitions=3, n_vertices=N,
    )
    return lay, src, dst, w


def _layout_weighted_arrays(lay):
    t = pq.read_table(lay.edges_in, columns=["src", "dst", "w"])
    return (
        t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["w"].to_numpy(zero_copy_only=False).astype(np.float64),
    )


def test_weighted_build_sums_duplicates(wlayout):
    lay, src, dst, w = wlayout
    assert lay.weighted
    s1, d1, w1 = _layout_weighted_arrays(lay)
    got = {(int(a), int(b)): float(x) for a, b, x in zip(s1, d1, w1)}
    want: dict = {}
    for a, b, x in zip(src.tolist(), dst.tolist(), w.tolist()):
        if a != b:
            want[(a, b)] = want.get((a, b), 0.0) + x
    for v in range(N):
        want[(v, v)] = 1.0  # self-loop weight (addEdge default)
    assert got == want
    # degrees = weighted out-sums
    degs = pq.read_table(lay.degrees, columns=["vid", "deg"]).to_pandas()
    dense = np.zeros(N)
    dense[degs["vid"].to_numpy()] = degs["deg"].to_numpy()
    exp = np.zeros(N)
    for (a, _b), x in want.items():
        exp[a] += x
    np.testing.assert_allclose(dense, exp)


def test_weighted_pagerank_matches_oracle(wlayout):
    lay, *_ = wlayout
    s1, d1, w1 = _layout_weighted_arrays(lay)
    want, _ = pagerank_power(s1, d1, N, tol=1e-12, w=w1)
    eng = PageRankEngine(lay, num_cpus_per_actor=0.25)
    try:
        for mode in ("barrier", "barrierfree"):
            res = eng.run(mode=mode, tol=1e-10)
            assert np.allclose(res.ranks, want, atol=1e-6), mode
    finally:
        eng.shutdown()


def test_unit_weights_equal_unweighted(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(23)
    # unique (src, dst) pairs: with duplicates the two builds legitimately
    # differ (weighted sums multiplicity, unweighted collapses it)
    keys = rng.choice(N * N, size=400, replace=False)
    src = (keys // N).astype(np.int64)
    dst = (keys % N).astype(np.int64)
    uw = gb.build_graph(
        rd.from_arrow(pa.table({"src": pa.array(src.astype(np.uint64)),
                                "dst": pa.array(dst.astype(np.uint64))})),
        str(tmp_path / "uw"), num_partitions=3, n_vertices=N,
    )
    wl = gb.build_graph(
        _wds(src, dst, np.ones(len(src))), str(tmp_path / "w1"),
        num_partitions=3, n_vertices=N,
    )
    e1 = PageRankEngine(uw, num_cpus_per_actor=0.25)
    e2 = PageRankEngine(wl, num_cpus_per_actor=0.25)
    try:
        r1 = e1.run(mode="barrier", tol=1e-10).ranks
        r2 = e2.run(mode="barrier", tol=1e-10).ranks
        np.testing.assert_allclose(r1, r2, atol=1e-12)
    finally:
        e1.shutdown()
        e2.shutdown()


def test_weighted_hot_split(ray_session, tmp_path):
    """Skew split composes with weights: celebrity in-edges carry weights,
    partial sums include them."""
    rng = np.random.default_rng(29)
    src = rng.integers(0, N, 800)
    dst = rng.integers(0, N, 800)
    dst[rng.random(800) < 0.4] = 0  # celebrity vertex 0
    w = rng.integers(1, 4, 800).astype(np.float64)
    lay = gb.build_graph(
        _wds(src, dst, w), str(tmp_path / "hw"), num_partitions=3,
        n_vertices=N, hot_in_threshold=30,
    )
    assert lay.n_hot >= 1 and lay.weighted
    s1 = pq.read_table(lay.edges_in, columns=["src"])["src"].to_numpy().astype(np.int64)
    h1 = pq.read_table(lay.edges_in_hot, columns=["src", "dst", "w"])
    allt = pq.read_table(lay.edges_in, columns=["src", "dst", "w"])
    s = np.concatenate([allt["src"].to_numpy(), h1["src"].to_numpy()]).astype(np.int64)
    d = np.concatenate([allt["dst"].to_numpy(), h1["dst"].to_numpy()]).astype(np.int64)
    ww = np.concatenate([allt["w"].to_numpy(), h1["w"].to_numpy()]).astype(np.float64)
    want, _ = pagerank_power(s, d, N, tol=1e-12, w=ww)
    eng = PageRankEngine(lay, num_cpus_per_actor=0.25)
    try:
        res = eng.run(mode="barrier", tol=1e-10)
        assert np.allclose(res.ranks, want, atol=1e-6)
    finally:
        eng.shutdown()


def test_weighted_dynamic_batch(wlayout, tmp_path):
    """Dynamic batches preserve weights: deletions drop pairs whole,
    insertions carry w=1 and sum into survivors; warm-started PageRank on
    the updated weighted layout matches the weighted oracle."""
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.updates import (
        apply_batch_to_layout,
        generate_batch,
        layout_edge_arrays,
    )

    lay, *_ = wlayout
    s0, d0 = layout_edge_arrays(lay)
    ds_, dd_, is_, id_ = generate_batch(s0, d0, N, batch_size=15, seed=9)
    new = apply_batch_to_layout(lay, str(tmp_path / "wupd"), ds_, dd_, is_, id_)
    assert new.weighted
    s1, d1, w1 = _layout_weighted_arrays(new)
    # deleted pairs absent unless re-inserted or self-loops
    inserted = set(zip(is_.tolist(), id_.tolist()))
    pairs = set(zip(s1.tolist(), d1.tolist()))
    for u, v in zip(ds_.tolist(), dd_.tolist()):
        if u != v and (u, v) not in inserted:
            assert (u, v) not in pairs
    want, _ = pagerank_power(s1, d1, N, tol=1e-12, w=w1)
    eng = PageRankEngine(new, num_cpus_per_actor=0.25)
    try:
        res = eng.run(mode="barrier", tol=1e-10)
        assert np.allclose(res.ranks, want, atol=1e-6)
    finally:
        eng.shutdown()


def test_transpose_preserves_weights(ray_session):
    got = (
        gb.transpose(_wds([1, 2], [3, 4], [5.0, 6.0]))
        .to_pandas()
        .sort_values("src")
        .reset_index(drop=True)
    )
    assert got["src"].tolist() == [3, 4]
    assert got["dst"].tolist() == [1, 2]
    assert got["w"].tolist() == [5.0, 6.0]
