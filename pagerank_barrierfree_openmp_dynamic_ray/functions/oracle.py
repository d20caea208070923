"""Single-process numpy oracles mirroring the reference's exact semantics.

These are the test-side golden references (the reference's own pattern:
compare every technique against a with-barrier run at tolerance 1e-100,
``main.cxx:191,207``).  They are NOT part of the engine's data path.
"""

from __future__ import annotations

import numpy as np


def pagerank_power(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    damping: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 500,
    init: np.ndarray | None = None,
    w: np.ndarray | None = None,
    dead: bool = False,
) -> tuple[np.ndarray, int]:
    """Synchronous pull PageRank, exactly ``pagerankBasicSeqLoop``
    (``src/pagerankBasic.hxx:36-50``): a[v] = C0 + P * sum_{(u,v)} r[u]/d[u],
    C0 = (1-P)/N (self-loop trick, ``main.cxx:240``), L-inf residual.

    ``dead=True`` is the teleport oracle (``pagerankTeleport``,
    `src/pagerank.hxx:157-184`): dead-end mass is redistributed uniformly
    each iteration, C0_t = (1-P)/N + P * sum_{deg(u)=0} r[u] / N — the
    textbook treatment for a graph WITHOUT the self-loop trick.

    Edges must already include self-loops unless ``dead``; every vertex
    0..n-1 exists.  Returns (ranks, iterations).
    """
    if w is None:
        deg = np.bincount(src, minlength=n).astype(np.float64)
    else:
        w = np.asarray(w, dtype=np.float64)
        deg = np.bincount(src, weights=w, minlength=n)
    r = np.full(n, 1.0 / n) if init is None else init.astype(np.float64).copy()
    c0 = (1.0 - damping) / n
    dead_v = deg == 0
    it = 0
    while it < max_iter:
        contrib = r[src] / deg[src]
        if w is not None:
            contrib = contrib * w
        c0_t = c0 + damping * r[dead_v].sum() / n if dead else c0
        a = c0_t + damping * np.bincount(dst, weights=contrib, minlength=n)
        it += 1
        err = np.abs(a - r).max()
        r = a
        if err < tol:
            break
    return r, it


def connected_components(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Min-vid label per undirected component (union-find)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(src.tolist(), dst.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    # normalize: component label = min vid among members
    minv: dict[int, int] = {}
    for i, r0 in enumerate(roots.tolist()):
        if r0 not in minv or i < minv[r0]:
            minv[r0] = i
    return np.array([minv[r0] for r0 in roots.tolist()], dtype=np.uint64)


def label_propagation(
    src: np.ndarray, dst: np.ndarray, n: int, max_iter: int = 20
) -> np.ndarray:
    """Deterministic synchronous label propagation on the undirected view:
    each round every vertex takes the most frequent label among its
    neighbors (tie -> smallest label); self counts once via the self-loop.
    Stops when stable or after ``max_iter`` rounds.  Operates on the simple
    undirected view (duplicate symmetric pairs collapse, matching the
    engine's deduped symmetric layout)."""
    key = np.unique(
        np.concatenate([src, dst]).astype(np.int64) * n
        + np.concatenate([dst, src]).astype(np.int64)
    )
    us, vs = key // n, key % n
    lab = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        nl = lab[us]
        # count (v, label) pairs; pick per v the (count desc, label asc) argmax
        key = vs.astype(np.int64) * (n + 1) + nl
        uniq, cnt = np.unique(key, return_counts=True)
        kv = uniq // (n + 1)
        kl = uniq % (n + 1)
        # order by (v asc, count desc, label asc) then take first per v
        order = np.lexsort((kl, -cnt, kv))
        kv_o = kv[order]
        first = np.concatenate([[True], kv_o[1:] != kv_o[:-1]])
        new = lab.copy()
        new[kv_o[first]] = kl[order][first]
        if np.array_equal(new, lab):
            break
        lab = new
    return lab.astype(np.uint64)


def triangle_count(src: np.ndarray, dst: np.ndarray, n: int) -> int:
    """Triangles of the simple undirected graph (self-loops ignored),
    via degree-ordered orientation + adjacency intersection."""
    m = src != dst
    us = np.concatenate([src[m], dst[m]]).astype(np.int64)
    vs = np.concatenate([dst[m], src[m]]).astype(np.int64)
    # dedup undirected edges
    key = np.unique(np.minimum(us, vs) * n + np.maximum(us, vs))
    a, b = key // n, key % n
    deg = np.bincount(np.concatenate([a, b]), minlength=n)
    # orient low -> high by (deg, vid)
    ka = deg[a] * (n + 1) + a
    kb = deg[b] * (n + 1) + b
    lo = np.where(ka < kb, a, b)
    hi = np.where(ka < kb, b, a)
    adj: dict[int, set] = {}
    for x, y in zip(lo.tolist(), hi.tolist()):
        adj.setdefault(x, set()).add(y)
    t = 0
    for x, y in zip(lo.tolist(), hi.tolist()):
        sx = adj.get(x)
        sy = adj.get(y)
        if sx and sy:
            t += len(sx & sy)
    return t
