"""Reachability over a persistent layout — the engine's traversal primitive.

Re-expresses ``dfsVisitedForEachW`` (`src/dfs.hxx:20-55`) and the affected-set
computation of the Traversal dynamic variant
(``pagerankAffectedTraversalW``, `src/pagerank.hxx:306-352`): mark every
vertex reachable from a seed set.  DFS order is irrelevant to the reference's
uses (it only needs the visited SET), so the distributed shape is iterative
frontier expansion — each round expands the whole frontier through the
``edges_out`` partitions that own a frontier vertex (wavefront BFS: rounds =
graph eccentricity, each round touches only the partitions with work).
"""

from __future__ import annotations

import numpy as np

from ..pipelines.pagerank import out_neighbors_from_layout
from ..stages.graph_build import GraphLayout


def reachable(layout: GraphLayout, sources: np.ndarray) -> np.ndarray:
    """All vids reachable from ``sources`` (inclusive) following out-edges.

    Driver holds one bool bitmap (n_vertices bits — the same budget the
    reference's ``vis`` vector uses); each round reads only the
    ``edges_out/part=p`` shards owning frontier vertices.
    """
    n = layout.n_vertices
    visited = np.zeros(n, dtype=bool)
    frontier = np.unique(np.asarray(sources, dtype=np.int64))
    frontier = frontier[(frontier >= 0) & (frontier < n)]
    visited[frontier] = True
    while len(frontier):
        nbrs = out_neighbors_from_layout(layout, frontier)
        nbrs = nbrs[nbrs < n]
        new = nbrs[~visited[nbrs]]
        visited[new] = True
        frontier = new
    return np.flatnonzero(visited)


def affected_traversal(
    old_layout: GraphLayout,
    new_layout: GraphLayout,
    del_src: np.ndarray,
    ins_src: np.ndarray,
) -> np.ndarray:
    """The Traversal dynamic rule (`src/pagerank.hxx:306-352`): affected =
    vertices reachable (in the NEW graph) from the endpoints of deletions
    (seeded through the OLD graph's out-neighbors) and insertions.  Returns
    the affected vid set; feed to ``CsrPartitionActor.mark_affected`` owners
    for a Traversal-variant dynamic run."""
    seeds = []
    ds = np.unique(np.asarray(del_src, dtype=np.int64))
    if len(ds):
        seeds.append(out_neighbors_from_layout(old_layout, ds))
        seeds.append(ds)
    ins = np.unique(np.asarray(ins_src, dtype=np.int64))
    if len(ins):
        seeds.append(ins)
    if not seeds:
        return np.empty(0, dtype=np.int64)
    return reachable(new_layout, np.concatenate(seeds))
