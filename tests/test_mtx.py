"""MTX source/sink (`src/mtx.hxx:33-180`): header parse, pattern/real reads,
symmetric mirror, size-line/edge collision, round trip, PageRank-on-mtx."""

import numpy as np
import pyarrow as pa
import pytest

import pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build as gb
from pagerank_barrierfree_openmp_dynamic_ray.functions.oracle import pagerank_power
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import PageRankEngine
from pagerank_barrierfree_openmp_dynamic_ray.sources.mtx import (
    read_mtx,
    read_mtx_header,
    write_mtx,
)


def _pairs(ds):
    pdf = ds.to_pandas()
    return sorted(zip(pdf["src"].tolist(), pdf["dst"].tolist()))


def test_pattern_general(ray_session, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "% a comment\n"
        "4 4 5\n"
        "1 2\n2 3\n3 1\n4 4\n1 4\n"
    )
    h = read_mtx_header(str(p))
    assert h == {"field": "pattern", "symmetry": "general", "rows": 4,
                 "cols": 4, "nnz": 5}
    edges, n = read_mtx(str(p))
    assert n == 4
    assert _pairs(edges) == [(0, 1), (0, 3), (1, 2), (2, 0), (3, 3)]


def test_symmetric_mirror(ray_session, tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "3 3 3\n"
        "2 1\n3 1\n3 3\n"
    )
    edges, n = read_mtx(str(p))
    # off-diagonal entries mirrored, diagonal kept single
    assert _pairs(edges) == [(0, 1), (0, 2), (1, 0), (2, 0), (2, 2)]


def test_real_weighted_and_size_collision(ray_session, tmp_path):
    """An edge numerically equal to the size line must survive the read."""
    p = tmp_path / "w.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "4 4 3\n"
        "1 2 0.5\n"
        "4 4 3\n"  # genuine edge == size triple
        "2 1 1.5\n"
    )
    edges, n = read_mtx(str(p), weighted=True)
    pdf = edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert pdf["src"].tolist() == [0, 1, 3]
    assert pdf["dst"].tolist() == [1, 0, 3]
    assert pdf["w"].tolist() == [0.5, 1.5, 3.0]
    # unweighted view of the same file
    e2, _ = read_mtx(str(p))
    assert _pairs(e2) == [(0, 1), (1, 0), (3, 3)]


def test_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(5)
    m, n = 500, 60
    src = rng.integers(0, n, m).astype(np.uint64)
    dst = rng.integers(0, n, m).astype(np.uint64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    p = str(tmp_path / "rt.mtx")
    write_mtx(ds, p, n)
    back, n2 = read_mtx(p)
    assert n2 == n
    assert _pairs(back) == sorted(zip(src.tolist(), dst.tolist()))
    # weighted round trip
    w = rng.uniform(0.1, 3.0, m)
    dsw = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst),
                                  "w": pa.array(w)}))
    pw = str(tmp_path / "rtw.mtx")
    write_mtx(dsw, pw, n, weighted=True)
    backw, _ = read_mtx(pw, weighted=True)
    got = backw.to_pandas().sort_values(["src", "dst", "w"]).reset_index(drop=True)
    want = dsw.to_pandas().sort_values(["src", "dst", "w"]).reset_index(drop=True)
    np.testing.assert_array_equal(got["src"], want["src"])
    np.testing.assert_allclose(got["w"], want["w"])  # %.17g is lossless


def test_pagerank_on_mtx_graph(ray_session, tmp_path):
    """End-to-end: a SuiteSparse-format fixture drives the full engine and
    matches the numpy oracle (the reference's conformance loop,
    `main.sh:74-87`)."""
    import ray.data as rd

    rng = np.random.default_rng(13)
    m, n = 900, 150
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    lines = [f"{int(s) + 1} {int(d) + 1}" for s, d in zip(src, dst)]
    p = tmp_path / "pr.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        f"{n} {n} {m}\n" + "\n".join(lines) + "\n"
    )
    edges, nv = read_mtx(str(p))
    lay = gb.build_graph(edges, str(tmp_path / "g"), num_partitions=3,
                         n_vertices=nv)
    import pyarrow.parquet as pq

    t = pq.read_table(lay.edges_in)
    want, _ = pagerank_power(
        t["src"].to_numpy().astype(np.int64),
        t["dst"].to_numpy().astype(np.int64), nv,
    )
    eng = PageRankEngine(lay, num_cpus_per_actor=0.25)
    try:
        res = eng.run(mode="barrier")
        np.testing.assert_allclose(res.ranks, want, atol=1e-6)
    finally:
        eng.shutdown()
