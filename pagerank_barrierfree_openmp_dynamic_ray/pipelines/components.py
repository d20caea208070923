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
    symmetric-mirror path, `src/mtx.hxx:72-73,138-139`)."""
    sym = edges.union(transpose(edges))
    return build_graph(sym, out_dir, num_partitions, n_vertices=n_vertices)


@dataclass
class LabelResult:
    labels: np.ndarray  # dense, indexed by vid
    iterations: int
    wall_s: float


class LabelEngine:
    """Iterative label algorithms over the partition actor pool."""

    def __init__(self, layout: GraphLayout, num_cpus_per_actor: float = 1.0):
        from ..state.partition_actor import CsrPartitionActor

        if layout.n_hot:
            raise ValueError(
                "LabelEngine requires a layout without hot-vertex splitting "
                "(build with hot_in_threshold=None); the min/mode combine "
                "for split vertices is not implemented"
            )
        self.layout = layout
        self.P = layout.num_partitions
        self.n = layout.n_vertices
        self.actors = [
            CsrPartitionActor.options(num_cpus=num_cpus_per_actor).remote(
                layout.path, pid
            )
            for pid in range(self.P)
        ]
        ray.get([a.ready.remote() for a in self.actors])

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def _iterate(self, step_name: str, max_iter: int) -> LabelResult:
        t0 = time.perf_counter()
        ray.get([a.init_labels.remote() for a in self.actors])
        shard_refs = [a.label_shard.remote() for a in self.actors]
        iters = 0
        while iters < max_iter:
            futs = [
                getattr(a, step_name).options(num_returns=2).remote(shard_refs)
                for a in self.actors
            ]
            shard_refs = [f[0] for f in futs]
            changed = sum(ray.get([f[1] for f in futs]))
            iters += 1
            if changed == 0:
                break
        shards = ray.get(list(shard_refs))
        out = np.empty(self.n, dtype=np.uint64)
        for p, sh in enumerate(shards):
            out[p:: self.P] = sh
        return LabelResult(out, iters, time.perf_counter() - t0)

    def connected_components(self, max_iter: int = 10_000) -> LabelResult:
        """Min-vid component labels, exact (converges in O(diameter))."""
        return self._iterate("cc_step", max_iter)

    def label_propagation(self, max_iter: int = 20) -> LabelResult:
        """Deterministic synchronous LP; stops when stable or at max_iter
        (synchronous LP can 2-cycle on bipartite structures — the cap is the
        standard remedy and part of the operator contract)."""
        return self._iterate("lp_step", max_iter)
