"""Triangle count — Dataset-native degree-oriented wedge join (SURVEY §2.12).

Shape (all Ray Data, two shuffles):
  1. canonicalize: drop self-loops, symmetrize to unique undirected pairs
     (lo, hi) — per-batch Arrow distinct + one groupby;
  2. degrees over the undirected pairs (per-batch bincount partials + small
     groupby);
  3. orient each pair low->high by (degree, vid) — the standard skew guard:
     every vertex's oriented out-degree is O(sqrt(m));
  4. wedges: groupby(oriented src).map_groups emits all ordered neighbor
     pairs (v, w);
  5. close: tagged-union groupby on the packed pair key counts wedges that
     coincide with an oriented edge.

The degree lookup in (3) is broadcast via ``ray.put`` (a dense uint array —
the small-side-broadcast pattern); at 1e12 vertices it becomes a join on the
degree table, same downstream shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Max, Sum


def _undirected_pairs(edges):
    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = s != d
        lo = np.minimum(s[m], d[m])
        hi = np.maximum(s[m], d[m])
        t = pa.table({"lo": pa.array(lo), "hi": pa.array(hi)})
        return t.group_by(["lo", "hi"]).aggregate([])

    pre = edges.map_batches(canon, batch_format="pyarrow")
    return (
        pre.groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["lo", "hi"])
    )


def triangle_count(edges, n_vertices: int) -> int:
    """Exact global triangle count of the simple undirected view."""
    und = _undirected_pairs(edges).materialize()

    # undirected degrees (broadcast small side)
    def degp(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch["lo"].to_numpy(zero_copy_only=False),
                batch["hi"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        vids, counts = np.unique(both, return_counts=True)
        return pa.table(
            {"vid": pa.array(vids), "deg_part": pa.array(counts.astype(np.int64))}
        )

    degt = (
        und.map_batches(degp, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("deg_part", alias_name="deg"))
        .to_pandas()
    )
    deg = np.zeros(n_vertices, dtype=np.int64)
    deg[degt["vid"].to_numpy()] = degt["deg"].to_numpy()
    deg_ref = ray.put(deg)
    n = np.uint64(n_vertices)

    def orient_and_key(batch: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = batch["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        ka = dg[a] * np.int64(n_vertices + 1) + a
        kb = dg[b] * np.int64(n_vertices + 1) + b
        u = np.where(ka < kb, a, b).astype(np.uint64)  # oriented src (small end)
        v = np.where(ka < kb, b, a).astype(np.uint64)
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    oriented = und.map_batches(orient_and_key, batch_format="pyarrow").materialize()

    # wedges per oriented source
    def wedges(group: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        v = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(v)
        if k < 2:
            return pa.table({"key": pa.array(np.empty(0, np.uint64)),
                             "wedge": pa.array(np.empty(0, np.int64))})
        # order neighbors by (deg, vid) so wedge pairs are emitted in the
        # same orientation as the oriented edges they might close
        order = np.argsort(dg[v] * np.int64(n_vertices + 1) + v, kind="stable")
        v = v[order]
        i, j = np.triu_indices(k, 1)
        key = v[i].astype(np.uint64) * n + v[j].astype(np.uint64)
        return pa.table(
            {"key": pa.array(key), "wedge": pa.array(np.ones(len(key), np.int64))}
        )

    wedge_ds = oriented.groupby("u").map_groups(wedges, batch_format="pyarrow")

    def edge_keys(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "key": pa.array(u * n + v),
                "wedge": pa.array(np.zeros(len(u), np.int64)),
            }
        )

    edge_key_ds = oriented.map_batches(edge_keys, batch_format="pyarrow")

    # close wedges: a pair key contributes (its wedge count) iff an oriented
    # edge row (wedge=0) is present in the same group
    def close(group: pa.Table) -> pa.Table:
        w = group["wedge"].to_numpy(zero_copy_only=False)
        has_edge = (w == 0).any()
        return pa.table({"tri": pa.array([int(w.sum()) if has_edge else 0])})

    closed = wedge_ds.union(edge_key_ds).groupby("key").map_groups(
        close, batch_format="pyarrow"
    )
    return int(closed.sum("tri") or 0)
