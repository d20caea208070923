"""Dynamic edge-batch generation and application.

Mirrors the reference experiment's update model (`main.cxx:38-66,74-117`):
a batch is `round(f*|E|)` uniform-random deletions (a random existing out-edge
of a random vertex, <=5 retries on empty, `src/random.hxx:34-58`) followed by
`round(f*|E|)` uniform-random insertions over the full id range
(`src/random.hxx:11-19`), applied to a duplicate of the original graph and
re-self-looped (`main.cxx:104-108`).

Application is set algebra on the edge Dataset (SURVEY §2.7):
  deletions  -> anti-join (broadcast the small batch, filter per Arrow batch)
  insertions -> union + dedup
  re-self-loop -> union with the full loop set (loops may have been deleted)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.graph_build import GraphLayout, add_self_loops, build_graph


def generate_batch(
    src: np.ndarray,
    dst: np.ndarray,
    n_vertices: int,
    batch_size: int,
    seed: int = 42,
    include_self_loops_in_pick: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Seeded (del_src, del_dst, ins_src, ins_dst) over the CURRENT edge set.

    Deletion picks a uniform vertex u then a uniform existing out-edge of u
    (adjacency in sorted order, matching LazyBitset iteration order,
    `src/_bitset.hxx`); 5 retries when u has no out-edges
    (`src/_utility.hxx:79-84`).  Driver-side by design: batches are tiny
    relative to |E| (fractions 1e-8..0.05 of |E|, `main.sh:20-26`).
    """
    rng = np.random.default_rng(seed)
    # adjacency view: edges sorted by (src, dst)
    order = np.lexsort((dst, src))
    s_sorted, d_sorted = src[order].astype(np.int64), dst[order].astype(np.int64)
    indptr = np.zeros(n_vertices + 1, dtype=np.int64)
    np.cumsum(np.bincount(s_sorted, minlength=n_vertices), out=indptr[1:])
    alive = np.ones(len(s_sorted), dtype=bool)

    del_s, del_d = [], []
    for _ in range(batch_size):
        for _retry in range(5):
            u = int(rng.random() * n_vertices)
            lo, hi = indptr[u], indptr[u + 1]
            live = np.flatnonzero(alive[lo:hi])
            if len(live) == 0:
                continue
            j = lo + live[int(rng.random() * len(live))]
            alive[j] = False
            del_s.append(u)
            del_d.append(int(d_sorted[j]))
            break

    ins_s, ins_d = [], []
    for _ in range(batch_size):
        ins_s.append(int(rng.random() * n_vertices))
        ins_d.append(int(rng.random() * n_vertices))

    return (
        np.array(del_s, dtype=np.int64),
        np.array(del_d, dtype=np.int64),
        np.array(ins_s, dtype=np.int64),
        np.array(ins_d, dtype=np.int64),
    )


def apply_batch(
    edges,
    n_vertices: int,
    del_src: np.ndarray,
    del_dst: np.ndarray,
    ins_src: np.ndarray,
    ins_dst: np.ndarray,
    weighted: bool = False,
):
    """Edge Dataset -> updated edge Dataset (deletions, insertions,
    re-self-loop, dedup).  The batch is broadcast (it is tiny); the sweep over
    the edge table is one vectorized map_batches — no shuffle for deletions.

    Weighted layouts: a deletion removes the (src, dst) edge entirely
    (``removeEdge`` semantics regardless of weight); an insertion carries
    weight 1.0 and SUMS into any surviving duplicate (the weighted-dedup
    policy).
    """
    import ray

    span = np.uint64(n_vertices)
    del_key = ray.put(
        np.unique(del_src.astype(np.uint64) * span + del_dst.astype(np.uint64))
    )

    def drop(batch: pa.Table) -> pa.Table:
        keys = ray.get(del_key)
        k = batch["src"].to_numpy(zero_copy_only=False).astype(np.uint64) * span + \
            batch["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.filter(pa.array(~np.isin(k, keys)))

    kept = edges.map_batches(drop, batch_format="pyarrow")

    import ray.data as rd

    cols = {
        "src": pa.array(ins_src.astype(np.uint64)),
        "dst": pa.array(ins_dst.astype(np.uint64)),
    }
    if weighted:
        cols["w"] = pa.array(np.ones(len(ins_src), np.float64))
    ins = rd.from_arrow(pa.table(cols))
    # union + re-self-loop + dedup (add_self_loops dedups the non-loop part)
    return add_self_loops(kept.union(ins), n_vertices, weighted=weighted)


def apply_batch_to_layout(
    layout: GraphLayout,
    out_dir: str,
    del_src: np.ndarray,
    del_dst: np.ndarray,
    ins_src: np.ndarray,
    ins_dst: np.ndarray,
) -> GraphLayout:
    """Old layout + batch -> NEW persistent layout (the reference's
    `y = duplicate(x); apply batch; yt = transposeWithDegree(y)`,
    `main.cxx:100-108`).  Reads the old edges from the partitioned parquet."""
    import os

    import ray.data as rd

    cols = ["src", "dst", "w"] if layout.weighted else ["src", "dst"]
    edges = rd.read_parquet(layout.edges_in, columns=cols)
    if layout.n_hot and os.path.isdir(layout.edges_in_hot):
        edges = edges.union(rd.read_parquet(layout.edges_in_hot, columns=cols))
    updated = apply_batch(
        edges, layout.n_vertices, del_src, del_dst, ins_src, ins_dst,
        weighted=layout.weighted,
    )
    # add_self_loops already applied; build_graph would re-apply (idempotent);
    # the old layout's split policy carries over — hot vertices are
    # re-detected on the updated graph (in-degrees may have shifted)
    return build_graph(
        updated,
        out_dir,
        layout.num_partitions,
        n_vertices=layout.n_vertices,
        add_loops=False,
        hot_in_threshold=layout.hot_in_threshold,
    )


def layout_edge_arrays(layout: GraphLayout) -> tuple[np.ndarray, np.ndarray]:
    """All edges of a layout as driver numpy arrays (test/oracle helper)."""
    import os

    import pyarrow.parquet as pq

    tabs = [pq.read_table(layout.edges_in, columns=["src", "dst"])]
    if layout.n_hot and os.path.isdir(layout.edges_in_hot):
        tabs.append(pq.read_table(layout.edges_in_hot, columns=["src", "dst"]))
    s = np.concatenate(
        [t["src"].to_numpy(zero_copy_only=False).astype(np.int64) for t in tabs]
    )
    d = np.concatenate(
        [t["dst"].to_numpy(zero_copy_only=False).astype(np.int64) for t in tabs]
    )
    return s, d
