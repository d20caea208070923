"""Graph construction: ids, dedup, self-loops, degrees, partitioned layout."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build as gb


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, dtype=np.uint64)),
                "dst": pa.array(np.asarray(dst, dtype=np.uint64)),
            }
        )
    )


def _read_layout_edges(layout, which="edges_in"):
    t = pq.read_table(getattr(layout, which))
    return (
        t["src"].to_numpy().astype(np.uint64),
        t["dst"].to_numpy().astype(np.uint64),
    )


def test_dedup_and_self_loops(ray_session, tiny_graph, tmp_path):
    src, dst, n = tiny_graph
    # duplicate every edge to exercise dedup
    ds = _edges_ds(np.concatenate([src, src]), np.concatenate([dst, dst]))
    layout = gb.build_graph(ds, str(tmp_path / "g"), num_partitions=3, n_vertices=n)
    assert layout.n_vertices == n
    # 6 real edges + 7 self-loops
    assert layout.n_edges == 13
    s, d = _read_layout_edges(layout)
    assert len(s) == 13
    pairs = set(zip(s.tolist(), d.tolist()))
    assert len(pairs) == 13
    for v in range(n):
        assert (v, v) in pairs


def test_degrees_after_self_loops(ray_session, tiny_graph, tmp_path):
    src, dst, n = tiny_graph
    layout = gb.build_graph(
        _edges_ds(src, dst), str(tmp_path / "g"), num_partitions=2, n_vertices=n
    )
    t = pq.read_table(layout.degrees)
    deg = np.zeros(n, dtype=np.int64)
    deg[t["vid"].to_numpy().astype(np.int64)] = t["deg"].to_numpy()
    # outdeg = real out-edges + 1 self-loop
    want = np.bincount(np.asarray(src, dtype=np.int64), minlength=n) + 1
    np.testing.assert_array_equal(deg, want)


def test_partitioning_is_modular(ray_session, tiny_graph, tmp_path):
    src, dst, n = tiny_graph
    P = 3
    layout = gb.build_graph(
        _edges_ds(src, dst), str(tmp_path / "g"), num_partitions=P, n_vertices=n
    )
    for p in range(P):
        d_in = os.path.join(layout.edges_in, f"part={p}")
        if os.path.isdir(d_in):
            t = pq.read_table(d_in)
            assert (t["dst"].to_numpy().astype(np.uint64) % P == p).all()
        d_out = os.path.join(layout.edges_out, f"part={p}")
        if os.path.isdir(d_out):
            t = pq.read_table(d_out)
            assert (t["src"].to_numpy().astype(np.uint64) % P == p).all()
    # reload round-trips
    l2 = gb.GraphLayout.load(str(tmp_path / "g"))
    assert (l2.n_vertices, l2.n_edges, l2.num_partitions) == (
        layout.n_vertices,
        layout.n_edges,
        layout.num_partitions,
    )


def test_transpose_and_selfloop_count(ray_session, tiny_graph):
    src, dst, n = tiny_graph
    ds = _edges_ds(src, dst)
    tr = gb.transpose(ds).to_pandas()
    assert set(zip(tr["src"], tr["dst"])) == set(
        zip(dst.tolist(), src.tolist())
    )
    assert gb.self_loop_count(ds) == 0
    withloops = gb.add_self_loops(ds, n)
    assert gb.self_loop_count(withloops) == n


def test_pages_to_graph_end_to_end(ray_session, pages_1k, tmp_path):
    import ray.data as rd

    pages = rd.read_parquet(pages_1k)
    layout = gb.build_graph_from_pages(pages, str(tmp_path / "g"), num_partitions=4)
    # vertex table covers all 1000 pages (every page is somebody's src or dst
    # is not guaranteed; but dst space is [0, n_pages) so vertices <= 1000)
    vt = pq.read_table(os.path.join(layout.path, "vertices"))
    assert 0 < layout.n_vertices <= 1000
    assert vt.num_rows == layout.n_vertices
    # vids dense 0..n-1, urls sorted
    vids = np.sort(vt["vid"].to_numpy().astype(np.int64))
    np.testing.assert_array_equal(vids, np.arange(layout.n_vertices))
    urls = vt.to_pandas().sort_values("vid")["url"].tolist()
    assert urls == sorted(urls)
    # every vertex has a self-loop -> outdeg >= 1
    t = pq.read_table(layout.degrees)
    assert t.num_rows == layout.n_vertices
    assert (t["deg"].to_numpy() >= 1).all()


def test_edges_to_vids_join_scale_path(ray_session, monkeypatch):
    """Force the distributed Dataset.join path (normally only at >20M
    vertices) and check it agrees with the broadcast path."""
    import ray.data as rd

    import pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build as gb

    rows = [
        {"src_url": f"u{a}", "dst_url": f"u{b}"}
        for a, b in [(0, 1), (1, 2), (2, 0), (3, 1), (0, 2)]
    ]
    edge_urls = rd.from_items(rows)
    vertices, n = gb.vertex_table(edge_urls)
    vertices = vertices.materialize()
    want = (
        gb.edges_to_vids(edge_urls, vertices, n)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    monkeypatch.setattr(gb, "BROADCAST_VERTEX_LIMIT", 0)
    got = (
        gb.edges_to_vids(edge_urls, vertices, n)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_like=True
    )


def _layout_snapshot(layout):
    """Canonical (edges_in, edges_out, degrees, meta) content of a layout."""
    def pairs(which):
        s, d = _read_layout_edges(layout, which)
        return sorted(zip(s.tolist(), d.tolist()))

    t = pq.read_table(layout.degrees)
    degs = sorted(zip(t["vid"].to_numpy().tolist(), t["deg"].to_numpy().tolist()))
    return (pairs("edges_in"), pairs("edges_out"), degs,
            layout.n_edges, layout.n_vertices, layout.n_hot)


def test_partition_local_dedup_matches_shuffle(ray_session, tmp_path):
    # duplicates, self-loops, and a skewed key; both plans must produce
    # byte-identical layout CONTENT (sets + degrees + counts)
    rng = np.random.default_rng(3)
    src = rng.integers(0, 40, 600)
    dst = rng.integers(0, 40, 600)
    ds = _edges_ds(np.concatenate([src, src[:300]]),
                   np.concatenate([dst, dst[:300]]))
    a = gb.build_graph(ds, str(tmp_path / "a"), num_partitions=3,
                       n_vertices=40, dedup_mode="shuffle")
    ds2 = _edges_ds(np.concatenate([src, src[:300]]),
                    np.concatenate([dst, dst[:300]]))
    b = gb.build_graph(ds2, str(tmp_path / "b"), num_partitions=3,
                       n_vertices=40, dedup_mode="partition_local")
    assert _layout_snapshot(a) == _layout_snapshot(b)


def test_partition_local_dedup_weighted_sums(ray_session, tmp_path):
    import ray.data as rd

    def wds():
        return rd.from_arrow(pa.table({
            "src": pa.array(np.array([0, 0, 1, 2, 2, 2], np.uint64)),
            "dst": pa.array(np.array([1, 1, 2, 0, 0, 2], np.uint64)),
            "w": pa.array(np.array([1.0, 2.5, 1.0, 3.0, 4.0, 9.0])),
        }))

    a = gb.build_graph(wds(), str(tmp_path / "wa"), num_partitions=2,
                       n_vertices=3, dedup_mode="shuffle")
    b = gb.build_graph(wds(), str(tmp_path / "wb"), num_partitions=2,
                       n_vertices=3, dedup_mode="partition_local")

    def wmap(layout):
        t = pq.read_table(layout.edges_in)
        return {(int(s), int(d)): float(w) for s, d, w in
                zip(t["src"].to_numpy(), t["dst"].to_numpy(),
                    t["w"].to_numpy())}

    wa, wb = wmap(a), wmap(b)
    assert wa == wb
    assert wa[(0, 1)] == 3.5          # duplicate weights summed
    assert wa[(2, 2)] == 1.0          # existing loop replaced by unit loop
    assert a.n_edges == b.n_edges


def test_partition_local_hot_split_matches(ray_session, tmp_path):
    # symmetric star graph: vertex 0 is hot; both plans must agree on the
    # hot set and the edges_in / edges_in_hot split
    n = 64
    others = np.arange(1, n, dtype=np.uint64)
    src = np.concatenate([np.zeros(n - 1, np.uint64), others])
    dst = np.concatenate([others, np.zeros(n - 1, np.uint64)])
    a = gb.build_graph(_edges_ds(src, dst), str(tmp_path / "ha"),
                       num_partitions=4, n_vertices=n, symmetric=True,
                       hot_in_threshold=32, dedup_mode="shuffle")
    b = gb.build_graph(_edges_ds(src, dst), str(tmp_path / "hb"),
                       num_partitions=4, n_vertices=n, symmetric=True,
                       hot_in_threshold=32, dedup_mode="partition_local")
    assert a.n_hot == b.n_hot == 1
    assert _layout_snapshot(a) == _layout_snapshot(b)
    sa, da = _read_layout_edges(a, "edges_in_hot")
    sb, db = _read_layout_edges(b, "edges_in_hot")
    assert sorted(zip(sa.tolist(), da.tolist())) == \
        sorted(zip(sb.tolist(), db.tolist()))
