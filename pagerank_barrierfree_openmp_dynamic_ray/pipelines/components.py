"""Connected components + label propagation on the partitioned-CSR engine.

Capabilities required by the north rule beyond the reference repo itself
(SURVEY §2.12): min-label propagation to fixed point (components, exact
match) and deterministic mode-of-neighbors label propagation (communities).

Both run on a SYMMETRIZED graph layout (edges ∪ transpose, deduped, with
self-loops), so the in-edge CSR of each partition covers ALL neighbors and
the PageRank engine's gather plan is reused unchanged — one build, every
algorithm (the reference builds its graph once and runs each algorithm over
it, `main.cxx:237-245`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import ray

from ..stages.graph_build import GraphLayout, build_graph, transpose


def build_symmetric_layout(edges, out_dir: str, num_partitions: int,
                           n_vertices: int | None = None) -> GraphLayout:
    """edges ∪ reversed(edges) -> deduped self-looped layout (the MTX
    symmetric-mirror path, `src/mtx.hxx:72-73,138-139`).  Use
    :func:`symmetric_layout_from` when a built layout already exists — it
    symmetrizes per partition with ZERO shuffles."""
    sym = edges.union(transpose(edges))
    return build_graph(sym, out_dir, num_partitions, n_vertices=n_vertices,
                       symmetric=True)


def _reshard_hot_part(hot_part_dir: str, tmp_dir: str, q: int, P: int) -> None:
    """One ``edges_in_hot`` shard (keyed src%P==q) re-bucketed by dst%P so
    each owner partition can pick up its hot in-edges locally during the
    symmetric merge.  One read + one write of the hot table total across all
    shards — the only data that moves, and it is exactly the skew tail."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not os.path.isdir(hot_part_dir):
        return
    t = pq.read_table(hot_part_dir, columns=["src", "dst"])
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    for p in np.unique(d % P):
        out = os.path.join(tmp_dir, f"part={int(p)}")
        os.makedirs(out, exist_ok=True)
        pq.write_table(t.filter(pa.array(d % P == p)),
                       os.path.join(out, f"from-{q}.parquet"))


def _symmetrize_part(layout_path: str, out_dir: str, p: int, span: int,
                     hot_by_dst_dir: str | None = None) -> int:
    """One partition of :func:`symmetric_layout_from`: the symmetric in-edge
    set of partition p is exactly edges_in/part=p ∪ reverse(edges_out/part=p)
    (both already keyed so the result lands on dst%P==p), deduped locally.
    Hot-split layouts add the partition's slice of the dst-resharded hot
    in-edges (``_reshard_hot_part``).  By symmetry the out-edge table of p is
    the SAME rows with the columns swapped, and out-degrees are the per-dst
    counts — no other data ever leaves the partition.  Returns the
    partition's edge count."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def read_dir(d):
        if not os.path.isdir(d):
            return (np.empty(0, np.uint64),) * 2
        t = pq.read_table(d, columns=["src", "dst"])
        return (
            t["src"].to_numpy(zero_copy_only=False).astype(np.uint64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64),
        )

    def read(sub):
        return read_dir(os.path.join(layout_path, sub, f"part={p}"))

    si, di = read("edges_in")
    so, do = read("edges_out")
    sp = np.uint64(span)
    fwd = [si * sp + di, do * sp + so]  # reversed out-edges
    if hot_by_dst_dir is not None:
        sh, dh = read_dir(os.path.join(hot_by_dst_dir, f"part={p}"))
        fwd.append(sh * sp + dh)
    keys = np.unique(np.concatenate(fwd))
    s, d = keys // sp, keys % sp

    def write(sub, tab):
        out = os.path.join(out_dir, sub, f"part={p}")
        os.makedirs(out, exist_ok=True)
        pq.write_table(tab, os.path.join(out, "data.parquet"))

    write("edges_in", pa.table({"src": pa.array(s), "dst": pa.array(d)}))
    write("edges_out", pa.table({"src": pa.array(d), "dst": pa.array(s)}))
    vids, counts = np.unique(d, return_counts=True)
    write("degrees", pa.table({"vid": pa.array(vids),
                               "deg": pa.array(counts.astype(np.int64))}))
    return len(keys)


def symmetric_layout_from(layout: GraphLayout, out_dir: str) -> GraphLayout:
    """Symmetrize an EXISTING layout without re-running the graph build.

    The naive path (``build_symmetric_layout`` over raw edges) pays a full
    dedup shuffle plus three partitioned writes — a second graph build just
    to add reverse edges.  But a built layout already holds every edge
    partitioned BOTH ways (edges_in by dst, edges_out by src), so the
    symmetric edge set of each partition is a purely local merge: zero
    shuffles, one parallel task per partition.  Self-loops carry over from
    the base layout (it has one per vertex).  Hot-split layouts pay ONE
    extra pass over the (bounded) hot table — each src-keyed hot shard is
    re-bucketed by dst%P so owners merge their hot in-edges locally; the
    cold tables still never move."""
    import os
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    hot_tmp = None
    if layout.n_hot:
        hot_tmp = os.path.join(out_dir, "_hot_by_dst")
        reshard = ray.remote(_reshard_hot_part)
        ray.get([
            reshard.remote(
                os.path.join(layout.edges_in_hot, f"part={q}"),
                hot_tmp, q, layout.num_partitions,
            )
            for q in range(layout.num_partitions)
        ])
    task = ray.remote(_symmetrize_part)
    counts = ray.get(
        [
            task.remote(layout.path, out_dir, p, layout.n_vertices, hot_tmp)
            for p in range(layout.num_partitions)
        ]
    )
    if hot_tmp is not None:
        shutil.rmtree(hot_tmp, ignore_errors=True)
    sym = GraphLayout(
        out_dir, layout.n_vertices, int(sum(counts)), layout.num_partitions,
        0, None, False,
    )
    sym.save()
    return sym


@dataclass
class LabelResult:
    labels: np.ndarray | None  # dense, indexed by vid (None if collect=False)
    iterations: int
    wall_s: float


class LabelEngine:
    """Iterative label algorithms over the partition actor pool."""

    def __init__(self, layout: GraphLayout, num_cpus_per_actor: float = 1.0,
                 init_wave: int | None = None):
        from ..state.partition_actor import CsrPartitionActor
        from .pagerank import _ready_in_waves, check_init_wave

        check_init_wave(init_wave)
        self.layout = layout
        self.P = layout.num_partitions
        self.n = layout.n_vertices
        self.actors = [
            CsrPartitionActor.options(num_cpus=num_cpus_per_actor).remote(
                layout.path, pid
            )
            for pid in range(self.P)
        ]
        _ready_in_waves(self.actors, init_wave)

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def _combine_hot(self, parts, kind: str) -> np.ndarray:
        """Driver combine of the per-partition hot-vertex label partials
        (tiny: n_hot-sized).  ``min``: elementwise minimum.  ``mode``: sum
        the (slot, label) histograms, then pick per slot the label with the
        highest count, ties -> smallest label (the lp_step tie rule)."""
        if kind == "min":
            return np.minimum.reduce(parts)
        n1 = np.int64(self.n + 1)
        allk = np.concatenate([p[0] for p in parts])
        allc = np.concatenate([p[1] for p in parts])
        uniq, inv = np.unique(allk, return_inverse=True)
        cnt = np.bincount(inv, weights=allc, minlength=len(uniq)).astype(np.int64)
        slot, labl = uniq // n1, uniq % n1
        order = np.lexsort((labl, -cnt, slot))
        s_o = slot[order]
        first = np.concatenate([[True], s_o[1:] != s_o[:-1]])
        modes = np.zeros(self.layout.n_hot, dtype=np.int64)
        modes[s_o[first]] = labl[order][first]  # every hot slot has >=1 edge
        return modes

    def _iterate(self, step_name: str, max_iter: int, collect: bool,
                 checkpoint_dir: str | None) -> LabelResult:
        t0 = time.perf_counter()
        ray.get([a.init_labels.remote() for a in self.actors])
        shard_refs = [a.label_shard.remote() for a in self.actors]
        hot_on = self.layout.n_hot > 0
        kind = "min" if step_name == "cc_step" else "mode"
        iters = 0
        while iters < max_iter:
            hot_vals = None
            if hot_on:
                # phase A (skew split): every partition returns its shard's
                # label partial for each hot vertex; the driver combines the
                # tiny vectors and phase B reuses the cached label gather
                parts = ray.get(
                    [a.label_hot_partial_step.remote(shard_refs, kind)
                     for a in self.actors]
                )
                hot_vals = self._combine_hot(parts, kind)
            futs = [
                getattr(a, step_name).options(num_returns=2).remote(
                    None if hot_on else shard_refs, hot_vals
                )
                for a in self.actors
            ]
            shard_refs = [f[0] for f in futs]
            changed = sum(ray.get([f[1] for f in futs]))
            iters += 1
            if changed == 0:
                break
        if checkpoint_dir:
            # each owner persists its own (vid, label) slice — consume via
            # state.checkpoint.labels_dataset / component_sizes_topk
            import os

            from ..state.checkpoint import write_lineage

            os.makedirs(checkpoint_dir, exist_ok=True)
            ray.get([a.write_label_checkpoint.remote(checkpoint_dir)
                     for a in self.actors])
            write_lineage(checkpoint_dir, iters, 0.0, "labels", step_name,
                          self.layout.path, self.P, self.n)
        if not collect:
            # the dense |V| label vector never reaches the driver (at
            # |V| = 10^9 it would be an 8 GB array) — the required shape
            # once labels outgrow one machine, mirroring PageRank's
            # run(collect=False)
            return LabelResult(None, iters, time.perf_counter() - t0)
        shards = ray.get(list(shard_refs))
        out = np.empty(self.n, dtype=np.uint64)
        for p, sh in enumerate(shards):
            out[p:: self.P] = sh
        return LabelResult(out, iters, time.perf_counter() - t0)

    def connected_components(self, max_iter: int = 10_000, collect: bool = True,
                             checkpoint_dir: str | None = None) -> LabelResult:
        """Min-vid component labels, exact (converges in O(diameter)).
        ``collect=False`` skips the driver-dense label vector; pass
        ``checkpoint_dir`` and read the result Dataset-natively."""
        return self._iterate("cc_step", max_iter, collect, checkpoint_dir)

    def label_propagation(self, max_iter: int = 20, collect: bool = True,
                          checkpoint_dir: str | None = None) -> LabelResult:
        """Deterministic synchronous LP; stops when stable or at max_iter
        (synchronous LP can 2-cycle on bipartite structures — the cap is the
        standard remedy and part of the operator contract)."""
        return self._iterate("lp_step", max_iter, collect, checkpoint_dir)
