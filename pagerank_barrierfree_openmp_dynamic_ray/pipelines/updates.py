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

    Deletion semantics mirror the reference (`src/random.hxx:34-58`): a
    uniform vertex u, then a uniform out-edge of u (adjacency in sorted
    order, matching LazyBitset iteration order, `src/_bitset.hxx`), retried
    up to 5 rounds when the pick fails — u has no out-edges, or the picked
    edge was already deleted this batch (`src/_utility.hxx:79-84`).  Fully
    VECTORIZED: each retry round draws all outstanding picks at once (the
    per-pick Python loop cost 44 s at a 51k batch over 51M edges; this is
    sub-second).  As in the reference, exhausting the retries can yield
    fewer than ``batch_size`` deletions.
    """
    rng = np.random.default_rng(seed)
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    deg = np.bincount(src, minlength=n_vertices)
    sp = np.int64(n_vertices)

    # never sort the full edge list (a 50M-edge lexsort+take costs ~50 s on
    # the driver): each round extracts ONLY the picked vertices' adjacency
    # (~batch_size * avg_degree edges), sorts that, and resolves picks with
    # searchsorted.  Edges are identified by their (src, dst) key — the
    # engine deletes by key (layouts are deduped), so key-level dedup is
    # exact.
    dead = np.empty(0, dtype=np.int64)  # sorted keys deleted so far
    del_s_parts, del_d_parts = [], []
    n_picked = 0
    for _retry in range(5):
        need = batch_size - n_picked
        if need <= 0:
            break
        u = (rng.random(need) * n_vertices).astype(np.int64)
        u = u[deg[u] > 0]
        if len(u) == 0:
            continue
        j = (rng.random(len(u)) * deg[u]).astype(np.int64)
        uu = np.unique(u)
        sel = np.isin(src, uu)
        ss, dd = src[sel], dst[sel]
        o = np.lexsort((dd, ss))
        ss, dd = ss[o], dd[o]
        e = np.searchsorted(ss, u) + j  # j < deg[u] = run length of u in ss
        keys = np.unique(ss[e] * sp + dd[e])  # in-round duplicate picks fail
        keys = keys[~np.isin(keys, dead)]  # already-deleted picks fail
        dead = np.union1d(dead, keys)
        del_s_parts.append(keys // sp)
        del_d_parts.append(keys % sp)
        n_picked += len(keys)
    del_s = np.concatenate(del_s_parts) if del_s_parts else np.empty(0, np.int64)
    del_d = np.concatenate(del_d_parts) if del_d_parts else np.empty(0, np.int64)

    ins_s = (rng.random(batch_size) * n_vertices).astype(np.int64)
    ins_d = (rng.random(batch_size) * n_vertices).astype(np.int64)
    return del_s, del_d, ins_s, ins_d


def _load_part_arrays(part_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Read one ``edges_out`` partition's (src, dst) arrays ONCE — unsorted.
    The retry rounds of :func:`generate_batch_from_layout` all resolve
    against these object-store-cached arrays; sorting happens per round over
    ONLY the picked vertices' adjacency (the array-path trick: a full
    |E|/P lexsort cost ~4 s per partition and dominated the call)."""
    import os

    import pyarrow.parquet as pq

    if not os.path.isdir(part_dir):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pq.read_table(part_dir, columns=["src", "dst"])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    return s, d


def _pick_edges_part(sd: tuple[np.ndarray, np.ndarray], us: np.ndarray,
                     fs: np.ndarray, span: int) -> np.ndarray:
    """Resolve deletion picks for the vertices owned by one ``edges_out``
    partition: vertex ``us[i]`` deletes its ``floor(fs[i] * deg)``-th
    out-edge (adjacency in (src, dst)-sorted order, matching the array
    path).  Only the picked vertices' edges are extracted and sorted.
    Returns the picked (src*span+dst) keys, -1 where the vertex has no
    out-edges."""
    s, d = sd
    if not len(s):
        return np.full(len(us), -1, dtype=np.int64)
    sp = np.int64(span)
    m = np.isin(s, np.unique(us))
    k = np.sort(s[m] * sp + d[m])  # (src, dst) order == sorted key order
    starts = np.searchsorted(k, us * sp)
    deg = np.searchsorted(k, (us + 1) * sp) - starts
    out = np.full(len(us), -1, dtype=np.int64)
    ok = deg > 0
    e = starts[ok] + (fs[ok] * deg[ok]).astype(np.int64)
    out[ok] = k[e]
    return out


def generate_batch_from_layout(
    layout: GraphLayout,
    batch_size: int,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Distributed :func:`generate_batch`: same semantics (uniform vertex,
    uniform out-edge, <= 5 retry rounds), but the edge list NEVER
    materializes on the driver — each retry round ships (vertex, uniform
    float) picks to one Ray task per touched ``edges_out`` partition, which
    resolves them against its own sorted adjacency.  The driver holds only
    the picks and the deleted-key set.  This is the batch generator the
    dynamic pipeline uses at scale; the array-based variant remains for
    in-memory tests/oracles."""
    import os

    import ray

    rng = np.random.default_rng(seed)
    n = layout.n_vertices
    P = layout.num_partitions
    sp = np.int64(n)
    load = ray.remote(_load_part_arrays)
    pick = ray.remote(_pick_edges_part)

    # each partition's sorted adjacency is loaded at most once per call and
    # stays in the object store; every retry round resolves against the refs
    adj_refs: dict[int, object] = {}
    dead = np.empty(0, dtype=np.int64)
    del_parts: list[np.ndarray] = []
    n_picked = 0
    for _retry in range(5):
        need = batch_size - n_picked
        if need <= 0:
            break
        u = (rng.random(need) * n).astype(np.int64)
        f = rng.random(need)
        for p in np.unique(u % P):
            if int(p) not in adj_refs:
                adj_refs[int(p)] = load.remote(
                    os.path.join(layout.edges_out, f"part={int(p)}"))
        futs = []
        for p in np.unique(u % P):
            m = (u % P) == p
            futs.append(pick.remote(adj_refs[int(p)], u[m], f[m], n))
        keys = np.concatenate(ray.get(futs))
        keys = np.unique(keys[keys >= 0])  # failed + duplicate picks retry
        keys = keys[~np.isin(keys, dead)]
        dead = np.union1d(dead, keys)
        del_parts.append(keys)
        n_picked += len(keys)
    del_k = np.concatenate(del_parts) if del_parts else np.empty(0, np.int64)

    ins_s = (rng.random(batch_size) * n).astype(np.int64)
    ins_d = (rng.random(batch_size) * n).astype(np.int64)
    return del_k // sp, del_k % sp, ins_s, ins_d


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
    incremental: bool = True,
) -> GraphLayout:
    """Old layout + batch -> NEW persistent layout (the reference's
    `y = duplicate(x); apply batch; yt = transposeWithDegree(y)`,
    `main.cxx:100-108`).

    Default plan is INCREMENTAL — the reference applies the delta in place
    (`src/Graph.hxx:343-360`, `src/update.hxx:77-99`); here the analogue is
    rewriting only the ``part=`` directories a batch endpoint touches and
    hard-linking every untouched partition into the new layout.  Cost is
    O(touched partitions), not O(|E|): a 0.1% batch no longer pays a full
    dedup shuffle + three re-partitions.

    Hot-split layouts apply incrementally too, with a STICKY hot set: hotness
    is a physical-layout property (membership in ``hot.npy`` is the exact
    split predicate, not the live in-degree), so batch endpoints route by the
    recorded set — hot-dst edges to ``edges_in_hot`` (src-keyed), the rest to
    ``edges_in`` (dst-keyed) — and the edge SET stays identical to a full
    rebuild.  A 0.1% batch cannot meaningfully shift the skew tail; pass
    ``incremental=False`` to re-detect hot membership from scratch."""
    if incremental:
        return _apply_batch_incremental(
            layout, out_dir, del_src, del_dst, ins_src, ins_dst
        )
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


def _link_tree(src_dir: str, dst_dir: str) -> None:
    """Hard-link every file of an untouched partition dir into the new
    layout (copy-on-write reuse; falls back to a real copy cross-device)."""
    import os
    import shutil

    for root, _dirs, files in os.walk(src_dir):
        rel = os.path.relpath(root, src_dir)
        out = os.path.join(dst_dir, rel) if rel != "." else dst_dir
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def _rewrite_edge_part(
    part_dir: str,
    out_part_dir: str,
    key_is_dst: bool,
    p: int,
    P: int,
    span: int,
    del_keys: np.ndarray,
    ins_src: np.ndarray,
    ins_dst: np.ndarray,
    restore_loops: np.ndarray,
    weighted: bool,
) -> tuple[int, int]:
    """One touched partition: survivors (minus deleted keys) ∪ this part's
    insertions ∪ re-added deleted self-loops, deduped (weighted: summed)
    vectorized in numpy.  Returns (old_rows, new_rows)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sp = np.uint64(span)
    cols = ["src", "dst", "w"] if weighted else ["src", "dst"]
    if os.path.isdir(part_dir):
        tab = pq.read_table(part_dir, columns=cols)
        s = tab["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = tab["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = tab["w"].to_numpy(zero_copy_only=False).astype(np.float64) if weighted else None
        old_rows = tab.num_rows
    else:
        s = d = np.empty(0, np.uint64)
        w = np.empty(0, np.float64) if weighted else None
        old_rows = 0
    keep = ~np.isin(s * sp + d, del_keys)
    s, d = s[keep], d[keep]
    if weighted:
        w = w[keep]

    key_end = ins_dst if key_is_dst else ins_src
    mine = (key_end % np.uint64(P)) == np.uint64(p)
    is_, id_ = ins_src[mine].astype(np.uint64), ins_dst[mine].astype(np.uint64)
    if weighted:
        # weighted semantics (add_self_loops): self-loops always carry
        # weight 1.0, so inserted loops never sum — drop them here and let
        # the restore list own loop re-creation
        nl = is_ != id_
        is_, id_ = is_[nl], id_[nl]
    rl = restore_loops[(restore_loops % np.uint64(P)) == np.uint64(p)].astype(np.uint64)

    if weighted:
        all_s = np.concatenate([s, is_])
        all_d = np.concatenate([d, id_])
        all_w = np.concatenate([w, np.ones(len(is_), np.float64)])
        keys = all_s * sp + all_d
        uniq, inv = np.unique(keys, return_inverse=True)
        wsum = np.bincount(inv, weights=all_w, minlength=len(uniq))
        uniq = np.concatenate([uniq, rl * sp + rl])
        wsum = np.concatenate([wsum, np.ones(len(rl), np.float64)])
        out = pa.table(
            {
                "src": pa.array(uniq // sp),
                "dst": pa.array(uniq % sp),
                "w": pa.array(wsum),
            }
        )
    else:
        keys = np.concatenate([s * sp + d, is_ * sp + id_, rl * sp + rl])
        uniq = np.unique(keys)
        out = pa.table({"src": pa.array(uniq // sp), "dst": pa.array(uniq % sp)})

    os.makedirs(out_part_dir, exist_ok=True)
    pq.write_table(out, os.path.join(out_part_dir, "data.parquet"))
    return old_rows, out.num_rows


def _rewrite_degree_part(
    deg_part_dir: str,
    out_part_dir: str,
    new_out_part_dir: str,
    affected: np.ndarray,
    weighted: bool,
) -> None:
    """Refresh the degree rows of the affected vids in one partition by
    recounting their out-edges in the (already rewritten) edges_out part —
    degrees and edges_out share the modulus, so the data is co-located."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tab = pq.read_table(deg_part_dir, columns=["vid", "deg"])
    vid = tab["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
    deg = tab["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
    o = np.argsort(vid, kind="stable")  # searchsorted below needs sorted vids
    vid, deg = vid[o], deg[o].copy()
    cols = ["src", "w"] if weighted else ["src"]
    et = pq.read_table(new_out_part_dir, columns=cols)
    es = et["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel = np.isin(es, affected)
    cnt_v, counts = (
        np.unique(es[sel], return_counts=True) if not weighted else (None, None)
    )
    if weighted:
        ew = et["w"].to_numpy(zero_copy_only=False)[sel]
        cnt_v, inv = np.unique(es[sel], return_inverse=True)
        counts = np.bincount(inv, weights=ew, minlength=len(cnt_v))
    # every vertex keeps its self-loop, so every affected vid still has
    # >= 1 out-edge and an existing row to update
    pos = np.searchsorted(vid, affected[np.isin(affected, vid)])
    lookup = np.zeros(len(vid), np.float64)
    lookup[np.searchsorted(vid, cnt_v)] = counts
    deg[pos] = lookup[pos]
    out = pa.table({"vid": pa.array(vid.astype(np.uint64)), "deg": pa.array(
        deg if weighted else deg.astype(np.int64))})
    os.makedirs(out_part_dir, exist_ok=True)
    pq.write_table(out, os.path.join(out_part_dir, "data.parquet"))


def _apply_batch_incremental(
    layout: GraphLayout,
    out_dir: str,
    del_src: np.ndarray,
    del_dst: np.ndarray,
    ins_src: np.ndarray,
    ins_dst: np.ndarray,
) -> GraphLayout:
    import os
    import shutil

    import ray

    for arr in (del_src, del_dst, ins_src, ins_dst):
        if len(arr) and int(np.max(arr)) >= layout.n_vertices:
            raise ValueError("batch endpoint outside the layout's id range")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    P = layout.num_partitions
    span = layout.n_vertices
    ds_, dd_ = del_src.astype(np.uint64), del_dst.astype(np.uint64)
    del_keys = np.unique(ds_ * np.uint64(span) + dd_)
    restore_loops = np.unique(del_src[del_src == del_dst]).astype(np.uint64)

    # hot routing (sticky hot set): in-edges with a HOT dst live in
    # edges_in_hot keyed by src % P; everything else in edges_in keyed by
    # dst % P.  A restored loop (v, v) lands at part v % P in either table,
    # so the same modulus filter inside _rewrite_edge_part applies to both.
    hot = layout.hot_vids() if layout.n_hot else np.empty(0, np.int64)
    dh = np.isin(dd_.astype(np.int64), hot)
    ih = np.isin(ins_dst.astype(np.int64), hot)
    rh = np.isin(restore_loops.astype(np.int64), hot)

    in_touch = np.unique(
        np.concatenate([dd_[~dh], ins_dst.astype(np.uint64)[~ih]]) % np.uint64(P)
    )
    hot_touch = np.unique(
        np.concatenate([ds_[dh], ins_src.astype(np.uint64)[ih]]) % np.uint64(P)
    )
    out_touch = np.unique(np.concatenate([ds_, ins_src.astype(np.uint64)]) % np.uint64(P))
    rewrite = ray.remote(_rewrite_edge_part)
    futs, in_futs = [], []
    plans = [
        ("edges_in", True, in_touch, ins_src[~ih], ins_dst[~ih],
         restore_loops[~rh], True),
        ("edges_out", False, out_touch, ins_src, ins_dst, restore_loops, False),
    ]
    if layout.n_hot:
        plans.append(("edges_in_hot", False, hot_touch, ins_src[ih],
                      ins_dst[ih], restore_loops[rh], True))
    for sub, key_is_dst, touched, i_s, i_d, rl, is_in in plans:
        tset = set(int(t) for t in touched)
        for p in range(P):
            old_p = os.path.join(layout.path, sub, f"part={p}")
            new_p = os.path.join(out_dir, sub, f"part={p}")
            if p in tset:
                f = rewrite.remote(
                    old_p, new_p, key_is_dst, p, P, span, del_keys,
                    i_s, i_d, rl, layout.weighted,
                )
                futs.append(f)
                if is_in:
                    in_futs.append(f)
            elif os.path.isdir(old_p):
                _link_tree(old_p, new_p)
    counts = ray.get(futs)  # barrier: degree refresh reads the new parts
    in_counts = {id(f): c for f, c in zip(futs, counts)}
    delta = sum(in_counts[id(f)][1] - in_counts[id(f)][0] for f in in_futs)

    # degree refresh: affected vids are the src endpoints of the batch
    affected_all = np.unique(
        np.concatenate([del_src, ins_src]).astype(np.int64)
    )
    deg_fut = []
    redeg = ray.remote(_rewrite_degree_part)
    tset = set(int(t) for t in out_touch)
    for p in range(P):
        old_p = os.path.join(layout.path, "degrees", f"part={p}")
        new_p = os.path.join(out_dir, "degrees", f"part={p}")
        if p in tset:
            mine = affected_all[affected_all % P == p]
            deg_fut.append(
                redeg.remote(
                    old_p, new_p, os.path.join(out_dir, "edges_out", f"part={p}"),
                    mine, layout.weighted,
                )
            )
        elif os.path.isdir(old_p):
            _link_tree(old_p, new_p)
    ray.get(deg_fut)

    if layout.n_hot:
        hot_src = os.path.join(layout.path, "hot.npy")
        try:
            os.link(hot_src, os.path.join(out_dir, "hot.npy"))
        except OSError:
            shutil.copy2(hot_src, os.path.join(out_dir, "hot.npy"))
    new_layout = GraphLayout(
        out_dir, layout.n_vertices, layout.n_edges + delta, P,
        layout.n_hot, layout.hot_in_threshold, layout.weighted,
    )
    new_layout.save()
    return new_layout


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
