"""Triangle count — degree-oriented wedge counting (SURVEY §2.12).

Shape:
  1. canonicalize: drop self-loops, symmetrize to unique undirected pairs
     (lo, hi) — per-batch Arrow distinct + one groupby;
  2. degrees over the undirected pairs (per-batch bincount partials + small
     groupby);
  3. orient each pair low->high by (degree, vid) — the standard skew guard:
     every vertex's oriented out-degree is O(sqrt(m));
  4. hash-partition oriented edges by u % P; each partition generates its
     wedges FULLY VECTORIZED (per-out-degree bucketing, no per-vertex Python
     loop) and counts closures.

Closure test has two physical plans:
  - broadcast (default, m <= broadcast_edge_limit): the sorted oriented-edge
    key array ships once via ``ray.put``; each partition closes its wedges
    with one ``searchsorted`` — no wedge ever leaves its partition.
  - shuffle (scale path): wedge keys + edge keys go through ONE native
    groupby aggregate (Sum of wedge flags, Max of edge flags) — no Python
    per-group calls; used when the edge key array would not fit a worker
    heap.
Both plans share the wedge generator; tests pin them to equal counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Max, Sum

BROADCAST_EDGE_LIMIT = 50_000_000


@ray.remote
def _sorted_key_array(*blocks: pa.Table) -> np.ndarray:
    """Concat + sort edge-key blocks into the broadcast closure array —
    runs in a worker so the driver never materializes the keys; the sorted
    array is returned straight into the object store."""
    if not blocks:
        return np.empty(0, dtype=np.uint64)
    tab = pa.concat_tables(list(blocks))
    return np.sort(tab["key"].to_numpy(zero_copy_only=False).astype(np.uint64))


def _undirected_pairs(edges, num_partitions: int = 32):
    """Distinct undirected pairs via per-batch Arrow distinct + one
    hash(lo,hi)%P-keyed shuffle with vectorized per-partition distinct (the
    fast dedup plan measured in stages.graph_build.dedup_edges)."""

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = s != d
        lo = np.minimum(s[m], d[m])
        hi = np.maximum(s[m], d[m])
        part = ((lo * np.uint64(1_000_003) + hi) % np.uint64(num_partitions)).astype(np.int32)
        t = pa.table({"lo": pa.array(lo), "hi": pa.array(hi), "part": pa.array(part)})
        return t.group_by(["lo", "hi", "part"]).aggregate([])

    def dedup_part(group: pa.Table) -> pa.Table:
        return group.select(["lo", "hi"]).group_by(["lo", "hi"]).aggregate([])

    return (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
    )


def _wedge_pairs(u: np.ndarray, v: np.ndarray, okey_v: np.ndarray,
                 n: np.uint64):
    """All wedge keys a*n+b for ordered neighbor pairs (a before b in
    orientation order) per center u.  Vectorized by out-degree bucket: one
    ``triu_indices`` + one fancy-index per distinct degree — no per-vertex
    Python loop.  Yields uint64 key arrays."""
    order = np.lexsort((okey_v, u))
    u = u[order]
    v = v[order]
    # segment boundaries per center
    change = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
    seg_len = np.diff(np.append(change, len(u)))
    for k in np.unique(seg_len):
        if k < 2:
            continue
        starts = change[seg_len == k]
        i, j = np.triu_indices(int(k), 1)
        a = v[starts[:, None] + i[None, :]]
        b = v[starts[:, None] + j[None, :]]
        yield a.ravel().astype(np.uint64) * n + b.ravel().astype(np.uint64)


DENSE_DEGREE_LIMIT = 100_000_000


def triangle_count(edges, n_vertices: int, num_partitions: int = 32,
                   broadcast_edge_limit: int = BROADCAST_EDGE_LIMIT,
                   dense_degree_limit: int = DENSE_DEGREE_LIMIT) -> int:
    """Exact global triangle count of the simple undirected view.

    Orientation keys (``deg*(n+1)+vid``) are attached AS A COLUMN during the
    orient step, so the wedge stages never need a degree lookup.  Two
    physical plans for the attach:
      - dense broadcast (|V| <= dense_degree_limit): the int64 degree vector
        ships once via ``ray.put`` (~0.8 GB at 10^8 vertices) — fastest at
        sandbox-to-midsize scale;
      - lookup join (scale path): the distributed (vid, deg) table is
        hash-split into object-store partitions and joined onto each pair
        endpoint (``stages.dedup.partition_side_table``/``_lookup_join``) —
        no |V|-dense array ever materializes on the driver.
    """
    und = _undirected_pairs(edges).materialize()

    # undirected degrees: bincount partials + vid%P-keyed shuffle with a
    # vectorized per-partition sum (the fast plan; no per-vid aggregate)
    DP = 32

    def degp(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch["lo"].to_numpy(zero_copy_only=False),
                batch["hi"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        vids, counts = np.unique(both, return_counts=True)
        return pa.table(
            {"vid": pa.array(vids), "deg_part": pa.array(counts.astype(np.int64)),
             "part": pa.array((vids % DP).astype(np.int32))}
        )

    def sum_part(group: pa.Table) -> pa.Table:
        v = group["vid"].to_numpy(zero_copy_only=False)
        c = group["deg_part"].to_numpy(zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        deg_sum = np.bincount(inv, weights=c, minlength=len(uv)).astype(np.int64)
        return pa.table({"vid": pa.array(uv), "deg": pa.array(deg_sum)})

    degs = (
        und.map_batches(degp, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sum_part, batch_format="pyarrow")
    )
    n = np.uint64(n_vertices)
    P = num_partitions
    span1 = np.int64(n_vertices + 1)

    def finish_orient(a, b, ka, kb):
        fwd = ka < kb
        u = np.where(fwd, a, b)
        v = np.where(fwd, b, a)
        return pa.table(
            {
                "u": pa.array(u.astype(np.uint64)),
                "v": pa.array(v.astype(np.uint64)),
                # orientation key of the far endpoint rides along so wedge
                # generation/closure never consults a degree table again
                "okey_v": pa.array(np.where(fwd, kb, ka).astype(np.int64)),
                "part": pa.array((u % P).astype(np.int32)),
            }
        )

    if n_vertices <= dense_degree_limit:
        degt = degs.to_pandas()
        deg = np.zeros(n_vertices, dtype=np.int64)
        deg[degt["vid"].to_numpy()] = degt["deg"].to_numpy()
        deg_ref = ray.put(deg)

        def orient(batch: pa.Table) -> pa.Table:
            dg = ray.get(deg_ref)
            a = batch["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            return finish_orient(a, b, dg[a] * span1 + a, dg[b] * span1 + b)

        oriented = und.map_batches(orient, batch_format="pyarrow").materialize()
    else:
        from ..stages.dedup import _lookup_join, partition_side_table

        side = partition_side_table(degs, key_col="vid", num_partitions=DP)
        j = _lookup_join(und, side, "lo", "deg", "dlo", ["lo", "hi"],
                         num_partitions=DP, side_key="vid")
        j = _lookup_join(j, side, "hi", "deg", "dhi", ["lo", "hi", "dlo"],
                         num_partitions=DP, side_key="vid")

        def orient(batch: pa.Table) -> pa.Table:
            a = batch["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            da = batch["dlo"].to_numpy(zero_copy_only=False).astype(np.int64)
            db = batch["dhi"].to_numpy(zero_copy_only=False).astype(np.int64)
            return finish_orient(a, b, da * span1 + a, db * span1 + b)

        oriented = j.map_batches(orient, batch_format="pyarrow").materialize()
    n_edges = oriented.count()

    if n_edges <= broadcast_edge_limit:
        # ---- broadcast closure: no wedge leaves its partition ----
        # The sorted key array is assembled in a WORKER task from the key
        # dataset's block refs (VERDICT r03 item 7): the driver holds only
        # ObjectRefs — its RSS stays flat — and the array lands in the
        # object store directly where the closure tasks read it.
        keys_ds = oriented.map_batches(
            lambda t: pa.table(
                {
                    "key": pa.array(
                        t["u"].to_numpy(zero_copy_only=False).astype(np.uint64) * n
                        + t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
                    )
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        key_refs = [
            ref
            for bundle in keys_ds.iter_internal_ref_bundles()
            for ref, meta in bundle.blocks
            if meta.num_rows
        ]
        ekey_ref = _sorted_key_array.remote(*key_refs)

        def count_part(group: pa.Table) -> pa.Table:
            ek = ray.get(ekey_ref)
            u = group["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            okey = group["okey_v"].to_numpy(zero_copy_only=False)
            tri = 0
            for keys in _wedge_pairs(u, v, okey, n):
                pos = np.searchsorted(ek, keys)
                pos[pos == len(ek)] = 0
                tri += int((ek[pos] == keys).sum())
            return pa.table({"tri": pa.array([tri], pa.int64())})

        closed = oriented.groupby("part").map_groups(
            count_part, batch_format="pyarrow"
        )
        return int(closed.sum("tri") or 0)

    # ---- shuffle closure (scale path): one native aggregate ----
    def wedge_rows(group: pa.Table) -> pa.Table:
        u = group["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        okey = group["okey_v"].to_numpy(zero_copy_only=False)
        keys = [k for k in _wedge_pairs(u, v, okey, n)]
        key = np.concatenate(keys) if keys else np.empty(0, np.uint64)
        return pa.table(
            {
                "key": pa.array(key),
                "w": pa.array(np.ones(len(key), np.int64)),
                "e": pa.array(np.zeros(len(key), np.int64)),
            }
        )

    wedge_ds = oriented.groupby("part").map_groups(wedge_rows, batch_format="pyarrow")

    def edge_rows(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "key": pa.array(u * n + v),
                "w": pa.array(np.zeros(len(u), np.int64)),
                "e": pa.array(np.ones(len(u), np.int64)),
            }
        )

    edge_ds = oriented.map_batches(edge_rows, batch_format="pyarrow")
    agg = (
        wedge_ds.union(edge_ds)
        .groupby("key")
        .aggregate(Sum("w", alias_name="nw"), Max("e", alias_name="he"))
    )

    def closed_only(batch: pa.Table) -> pa.Table:
        nw = batch["nw"].to_numpy(zero_copy_only=False)
        he = batch["he"].to_numpy(zero_copy_only=False)
        return pa.table({"tri": pa.array([int(nw[he > 0].sum())], pa.int64())})

    return int(agg.map_batches(closed_only, batch_format="pyarrow").sum("tri") or 0)
