"""Connected components / label propagation / triangle count vs oracles
(exact match, FIXTURES.md §4)."""

import numpy as np
import pyarrow as pa
import pytest

import pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build as gb
from pagerank_barrierfree_openmp_dynamic_ray.functions import oracle
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.components import (
    LabelEngine,
    build_symmetric_layout,
)
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.triangles import triangle_count


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, np.uint64)),
                "dst": pa.array(np.asarray(dst, np.uint64)),
            }
        )
    )


def test_cc_tiny(ray_session, tiny_graph, tmp_path):
    src, dst, n = tiny_graph
    lay = build_symmetric_layout(_ds(src, dst), str(tmp_path / "s"), 3, n_vertices=n)
    eng = LabelEngine(lay, num_cpus_per_actor=0.25)
    res = eng.connected_components()
    eng.shutdown()
    # components {0,1,2,3}, {4,5}, {6} (FIXTURES.md §5)
    np.testing.assert_array_equal(res.labels, [0, 0, 0, 0, 4, 4, 6])
    want = oracle.connected_components(src, dst, n)
    np.testing.assert_array_equal(res.labels, want)


def test_cc_random(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    n = 500
    # sparse graph -> many components
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    lay = build_symmetric_layout(_ds(src, dst), str(tmp_path / "s"), 4, n_vertices=n)
    eng = LabelEngine(lay, num_cpus_per_actor=0.25)
    res = eng.connected_components()
    eng.shutdown()
    want = oracle.connected_components(src, dst, n)
    np.testing.assert_array_equal(res.labels, want)


def test_label_propagation_matches_oracle(ray_session, tmp_path):
    rng = np.random.default_rng(4)
    n = 200
    # two dense-ish clusters + sparse bridges
    a = rng.integers(0, n // 2, (400, 2))
    b = rng.integers(n // 2, n, (400, 2))
    bridge = np.array([[1, n // 2 + 1], [2, n // 2 + 2]])
    e = np.vstack([a, b, bridge])
    src, dst = e[:, 0], e[:, 1]
    lay = build_symmetric_layout(_ds(src, dst), str(tmp_path / "s"), 3, n_vertices=n)
    eng = LabelEngine(lay, num_cpus_per_actor=0.25)
    res = eng.label_propagation(max_iter=20)
    eng.shutdown()
    # oracle runs on the deduped symmetric self-looped view == layout content
    import pyarrow.parquet as pq

    t = pq.read_table(lay.edges_in)
    ls, ld = (
        t["src"].to_numpy().astype(np.int64),
        t["dst"].to_numpy().astype(np.int64),
    )
    want = oracle.label_propagation(ls, ld, n, max_iter=20)
    np.testing.assert_array_equal(res.labels, want)


def test_triangles_tiny(ray_session, tiny_graph):
    src, dst, n = tiny_graph
    # tiny graph: one triangle {0,1,2} after symmetrization
    assert triangle_count(_ds(src, dst), n) == 1
    assert oracle.triangle_count(src, dst, n) == 1


def test_triangles_random(ray_session):
    rng = np.random.default_rng(6)
    n = 120
    src = rng.integers(0, n, 900)
    dst = rng.integers(0, n, 900)
    got = triangle_count(_ds(src, dst), n)
    want = oracle.triangle_count(src, dst, n)
    assert got == want
    assert want > 0


def test_triangles_shuffle_plan_matches_broadcast(ray_session):
    """broadcast_edge_limit=0 forces the scale-path aggregate closure; both
    physical plans must count identically (incl. a skewed hub vertex)."""
    rng = np.random.default_rng(9)
    n = 100
    src = np.concatenate([rng.integers(0, n, 600), np.zeros(50, np.int64)])
    dst = np.concatenate([rng.integers(0, n, 600), rng.integers(0, n, 50)])
    ds = _ds(src, dst)
    want = oracle.triangle_count(src, dst, n)
    assert triangle_count(ds, n) == want
    assert triangle_count(ds, n, broadcast_edge_limit=0) == want


def test_triangles_distributed_degree_join(ray_session):
    """dense_degree_limit=0 forces the lookup-join orientation (no |V|-dense
    degree vector on the driver); both closure plans still count exactly."""
    rng = np.random.default_rng(12)
    n = 100
    src = np.concatenate([rng.integers(0, n, 600), np.zeros(40, np.int64)])
    dst = np.concatenate([rng.integers(0, n, 600), rng.integers(0, n, 40)])
    ds = _ds(src, dst)
    want = oracle.triangle_count(src, dst, n)
    assert triangle_count(ds, n, dense_degree_limit=0) == want
    assert triangle_count(ds, n, dense_degree_limit=0,
                          broadcast_edge_limit=0) == want


def test_label_propagation_large_id_space(ray_session, tmp_path):
    """Regression: lp_step's (vertex, label) key packing must be int64 —
    with int32 local slots and n_vertices > ~131k/P the product wrapped
    silently (numpy 1.x value-based casting)."""
    n = 150_000
    # a small clique among high-id vertices; everything else isolated
    hi = np.array([n - 1, n - 2, n - 3, n - 7], dtype=np.int64)
    src = np.repeat(hi, len(hi))
    dst = np.tile(hi, len(hi))
    lay = build_symmetric_layout(
        _ds(src, dst), str(tmp_path / "big"), 3, n_vertices=n
    )
    eng = LabelEngine(lay, num_cpus_per_actor=0.25)
    res = eng.label_propagation(max_iter=8)
    eng.shutdown()
    # clique converges to one label; isolated vertices keep their own
    assert len(set(res.labels[hi].tolist())) == 1
    others = np.setdiff1d(np.arange(n), hi)[:1000]
    np.testing.assert_array_equal(res.labels[others], others)


def test_symmetric_layout_from_matches_shuffle_path(ray_session, tmp_path):
    """The zero-shuffle per-partition symmetrization must produce the same
    edge set, degrees, and CC labels as the full build over edges∪reverse."""
    import os

    import pyarrow.parquet as pq

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.components import (
        symmetric_layout_from,
    )

    rng = np.random.default_rng(17)
    n, m = 200, 1200
    src = rng.integers(0, n, m).astype(np.uint64)
    dst = rng.integers(0, n, m).astype(np.uint64)
    base = gb.build_graph(_ds(src, dst), str(tmp_path / "base"), 3, n_vertices=n)
    fast = symmetric_layout_from(base, str(tmp_path / "fast"))
    slow = build_symmetric_layout(_ds(src, dst), str(tmp_path / "slow"), 3,
                                  n_vertices=n)
    assert fast.n_edges == slow.n_edges

    def read_pairs(lay, sub):
        t = pq.read_table(os.path.join(lay.path, sub), columns=["src", "dst"])
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return sorted(zip(s.tolist(), d.tolist()))

    for sub in ("edges_in", "edges_out"):
        assert read_pairs(fast, sub) == read_pairs(slow, sub)

    def read_degs(lay):
        t = pq.read_table(os.path.join(lay.path, "degrees"))
        return sorted(zip(t["vid"].to_numpy(zero_copy_only=False).tolist(),
                          t["deg"].to_numpy(zero_copy_only=False).tolist()))

    assert read_degs(fast) == read_degs(slow)

    e1 = LabelEngine(fast, num_cpus_per_actor=0.25)
    r1 = e1.connected_components(); e1.shutdown()
    want = oracle.connected_components(src, dst, n)
    np.testing.assert_array_equal(r1.labels, want)


def test_symmetric_layout_from_hot_split(ray_session, tmp_path):
    """Hot-split layouts now take the per-partition merge path too (VERDICT
    r02 item 5): the src-sharded hot in-edges are re-bucketed by dst once,
    then each owner merges locally — same edge set, degrees and CC labels as
    the full shuffle build, no fallback."""
    import os

    import pyarrow.parquet as pq

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.components import (
        symmetric_layout_from,
    )

    rng = np.random.default_rng(23)
    n, m = 200, 1600
    src = rng.integers(0, n, m).astype(np.uint64)
    celeb = rng.integers(0, 6, m).astype(np.uint64)
    dst = np.where(rng.random(m) < 0.3, celeb,
                   rng.integers(0, n, m).astype(np.uint64))
    base = gb.build_graph(_ds(src, dst), str(tmp_path / "base"), 3,
                          n_vertices=n, hot_in_threshold=24)
    assert base.n_hot > 0
    fast = symmetric_layout_from(base, str(tmp_path / "fast"))
    assert not os.path.isdir(os.path.join(fast.path, "_hot_by_dst"))
    slow = build_symmetric_layout(_ds(src, dst), str(tmp_path / "slow"), 3,
                                  n_vertices=n)
    assert fast.n_edges == slow.n_edges

    def read_pairs(lay, sub):
        t = pq.read_table(os.path.join(lay.path, sub), columns=["src", "dst"])
        return sorted(zip(t["src"].to_numpy(zero_copy_only=False).tolist(),
                          t["dst"].to_numpy(zero_copy_only=False).tolist()))

    for sub in ("edges_in", "edges_out"):
        assert read_pairs(fast, sub) == read_pairs(slow, sub)
    eng = LabelEngine(fast, num_cpus_per_actor=0.25)
    try:
        np.testing.assert_array_equal(
            eng.connected_components().labels,
            oracle.connected_components(src, dst, n),
        )
    finally:
        eng.shutdown()


def test_cc_lp_on_hot_split_layout(ray_session, tmp_path):
    """CC and LP on a layout built WITH hot-vertex splitting: the split
    vertices' min/mode must combine across the src-sharded partials and
    match both the non-split run and the oracles."""
    import os

    rng = np.random.default_rng(29)
    n = 250
    src = rng.integers(0, n, 900)
    dst = rng.integers(0, n, 900)
    # a celebrity vertex guarantees hot members at a low threshold
    src = np.concatenate([src, rng.integers(0, n, 120)])
    dst = np.concatenate([dst, np.full(120, 7)])
    sym = np.vstack([np.stack([src, dst], 1), np.stack([dst, src], 1)])
    hot_lay = gb.build_graph(_ds(sym[:, 0], sym[:, 1]), str(tmp_path / "hot"),
                             num_partitions=3, n_vertices=n, hot_in_threshold=12)
    assert hot_lay.n_hot > 0
    flat_lay = build_symmetric_layout(_ds(src, dst), str(tmp_path / "flat"), 3,
                                      n_vertices=n)
    e_hot = LabelEngine(hot_lay, num_cpus_per_actor=0.25)
    e_flat = LabelEngine(flat_lay, num_cpus_per_actor=0.25)
    try:
        cc_hot = e_hot.connected_components()
        np.testing.assert_array_equal(
            cc_hot.labels, oracle.connected_components(src, dst, n))
        lp_hot = e_hot.label_propagation(max_iter=15)
        lp_flat = e_flat.label_propagation(max_iter=15)
        np.testing.assert_array_equal(lp_hot.labels, lp_flat.labels)
    finally:
        e_hot.shutdown()
        e_flat.shutdown()


def test_labels_dataset_native(ray_session, tmp_path):
    """collect=False + label checkpoint: the driver never holds the dense
    |V| vector, yet the checkpointed Dataset and the top-component sizes
    match the collected run exactly (the CC/LP twin of run(collect=False))."""
    from pagerank_barrierfree_openmp_dynamic_ray.state.checkpoint import (
        component_sizes_topk,
        labels_dataset,
        read_lineage,
    )

    rng = np.random.default_rng(7)
    n = 400
    src = rng.integers(0, n, 250)
    dst = rng.integers(0, n, 250)
    lay = build_symmetric_layout(_ds(src, dst), str(tmp_path / "s"), 4, n_vertices=n)
    eng = LabelEngine(lay, num_cpus_per_actor=0.25)
    dense = eng.connected_components().labels
    ck = str(tmp_path / "labck")
    res = eng.connected_components(collect=False, checkpoint_dir=ck)
    eng.shutdown()
    assert res.labels is None
    df = labels_dataset(ck).to_pandas().sort_values("vid")
    np.testing.assert_array_equal(df["label"].to_numpy(), dense.astype(np.int64))
    assert read_lineage(ck)["mode"] == "labels"
    # top components by size, computed without any dense driver state
    top = component_sizes_topk(ck, k=5).to_pandas()
    labs, sizes = np.unique(dense, return_counts=True)
    order = np.lexsort((labs, -sizes))[:5]
    np.testing.assert_array_equal(top["label"].to_numpy(), labs[order].astype(np.int64))
    np.testing.assert_array_equal(top["size"].to_numpy(), sizes[order])
