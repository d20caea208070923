"""Per-partition CSR block — the pinned state of one partition actor.

Reference state being re-expressed (SURVEY §2.3): the shared-heap graph +
transpose (`main.cxx:237-241`), rank vector (`src/pagerank.hxx:482-492`),
converged flags (`src/pagerankBarrierfree.hxx:76-77`) and affected/frontier
flags (`src/pagerankBasic.hxx:178`).  Here each partition owns the vertices
``v % P == pid`` (local slot ``v // P``) — the modular analogue of the
reference's ``belongsOmp`` ownership (`src/_openmp.hxx:15-26`).

The block holds:
- in-CSR over owned destinations (rank pull side, `src/pagerank.hxx:203-213`):
  edges sorted by (dst_local, src), ``in_indptr`` per owned slot;
- a *gather plan*: per source-owner partition, the local indices of the
  source vertices this block reads.  Each iteration the actor fetches ONLY
  the contribution shards it references — at sandbox scale that degenerates
  to all partitions, but it is the mechanism that keeps per-iteration traffic
  proportional to the cut, not to |V|, on a real cluster;
- owned out-degrees (so the owner publishes ``c[v] = r[v]/deg[v]`` and no
  degree vector is ever broadcast);
- out-CSR over owned sources (frontier expansion side,
  `src/pagerankBasic.hxx:196`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow.parquet as pq


def range_gather(indptr: np.ndarray, sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Positions of all CSR entries for the selected segments.

    Returns (pos, seg): ``pos`` indexes the CSR value arrays, ``seg`` maps
    each position to its index within ``sel``.  Vectorized (no Python loop).
    """
    starts = indptr[sel]
    counts = (indptr[sel + 1] - starts).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    before = np.cumsum(counts) - counts
    pos = np.repeat(starts - before, counts) + np.arange(total, dtype=np.int64)
    seg = np.repeat(np.arange(len(sel), dtype=np.int64), counts)
    return pos, seg


@dataclass
class CsrPartition:
    pid: int
    num_partitions: int
    n_vertices: int
    n_owned: int
    # in-edge side (sorted by (dst_local, src))
    in_indptr: np.ndarray  # int64 [n_owned+1]
    in_dst_local: np.ndarray  # int64 per edge
    in_src_pos: np.ndarray  # int64 per edge -> index into gathered contributions
    # gather plan
    needed_parts: np.ndarray  # int64 sorted part ids
    needs: list[np.ndarray]  # per needed part: local idx into that part's shard
    # owned vertex data
    outdeg: np.ndarray  # float64 [n_owned]
    # out-edge side (sorted by (src_local, dst))
    out_indptr: np.ndarray  # int64 [n_owned+1]
    out_dst: np.ndarray  # uint64 global dst vids
    # hot-vertex split (skew handling): this partition's src%P shard of the
    # in-edges of every HOT (high-in-degree) vertex.  hot_slot indexes the
    # GLOBAL sorted hot list; hot_src_pos indexes the gathered cvals.
    n_hot: int = 0
    hot_slot: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    hot_src_pos: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    # owned hot vertices: local slot + index into the global hot list, and a
    # dense slot->hot-index map (-1 = cold) for frontier-selected sweeps
    own_hot_slots: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    own_hot_idx: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    hot_idx_of_slot: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    # optional per-edge weights (weighted graphs; None = unweighted)
    in_w: np.ndarray | None = None
    hot_w: np.ndarray | None = None

    @staticmethod
    def owned_count(n_vertices: int, pid: int, num_partitions: int) -> int:
        return max(0, (n_vertices - pid + num_partitions - 1) // num_partitions)

    def owned_vids(self) -> np.ndarray:
        return np.arange(self.pid, self.n_vertices, self.num_partitions, dtype=np.uint64)

    @classmethod
    def build(
        cls,
        pid: int,
        num_partitions: int,
        n_vertices: int,
        in_src: np.ndarray,
        in_dst: np.ndarray,
        out_src: np.ndarray,
        out_dst: np.ndarray,
        deg_vid: np.ndarray,
        deg: np.ndarray,
        hot_vids: np.ndarray | None = None,
        hot_src: np.ndarray | None = None,
        hot_dst: np.ndarray | None = None,
        in_w: np.ndarray | None = None,
        hot_w: np.ndarray | None = None,
    ) -> "CsrPartition":
        P = num_partitions
        n_owned = cls.owned_count(n_vertices, pid, P)
        hot_vids = np.asarray(hot_vids if hot_vids is not None else [], np.int64)
        hot_src = np.asarray(hot_src if hot_src is not None else [], np.int64)
        hot_dst = np.asarray(hot_dst if hot_dst is not None else [], np.int64)
        n_hot = len(hot_vids)

        # ---- in-CSR (cold edges whose dst is owned) ----
        in_src = np.asarray(in_src, dtype=np.int64)
        in_dst = np.asarray(in_dst, dtype=np.int64)
        # id-range guard: an undersized n_vertices would silently corrupt
        # the local-slot bincounts below (the reference's span() invariant,
        # `src/Graph.hxx:35`)
        for arr in (in_src, in_dst, hot_src, hot_dst):
            if len(arr) and int(arr.max()) >= n_vertices:
                raise ValueError(
                    f"edge endpoint {int(arr.max())} >= n_vertices {n_vertices}"
                )
        dl = in_dst // P
        order = np.lexsort((in_src, dl))
        dl = dl[order]
        s = in_src[order]
        # release the unsorted endpoint arrays NOW: at 1e9-edge scale the
        # build's transient peak (not the pinned result) is what OOMs a
        # many-actor first start, and the caller handed us sole ownership
        in_src = in_dst = None
        if in_w is not None:
            in_w = np.asarray(in_w, dtype=np.float64)[order]
        order = None
        in_indptr = np.zeros(n_owned + 1, dtype=np.int64)
        np.cumsum(np.bincount(dl, minlength=n_owned), out=in_indptr[1:])

        # ---- gather plan over distinct sources (cold + hot-shard edges) ----
        usrc = np.unique(np.concatenate([s, hot_src]))  # sorted by vid
        owner = usrc % P
        by_owner = np.argsort(owner, kind="stable")  # (owner, vid) order
        inv = np.empty(len(usrc), dtype=np.int64)
        inv[by_owner] = np.arange(len(usrc), dtype=np.int64)
        src_pos = inv[np.searchsorted(usrc, s)]
        hot_src_pos = inv[np.searchsorted(usrc, hot_src)]
        s = inv = None  # transient-peak control (see in-CSR note above)
        owner_sorted = owner[by_owner]
        usrc_sorted = usrc[by_owner]
        needed_parts, first = np.unique(owner_sorted, return_index=True)
        bounds = np.append(first, len(usrc_sorted))
        needs = [
            (usrc_sorted[bounds[i]: bounds[i + 1]] // P).astype(np.int64)
            for i in range(len(needed_parts))
        ]

        # ---- hot split bookkeeping ----
        hot_slot = np.searchsorted(hot_vids, hot_dst) if n_hot else np.empty(0, np.int64)
        own_hot = hot_vids[hot_vids % P == pid] if n_hot else np.empty(0, np.int64)
        own_hot_slots = (own_hot // P).astype(np.int64)
        own_hot_idx = np.searchsorted(hot_vids, own_hot).astype(np.int64)
        hot_idx_of_slot = np.full(n_owned, -1, dtype=np.int64)
        hot_idx_of_slot[own_hot_slots] = own_hot_idx

        # ---- owned degrees ----
        outdeg = np.zeros(n_owned, dtype=np.float64)
        if len(deg_vid):
            outdeg[np.asarray(deg_vid, dtype=np.int64) // P] = np.asarray(deg, dtype=np.float64)

        # ---- out-CSR (edges whose src is owned) ----
        out_src = np.asarray(out_src, dtype=np.int64)
        out_dst = np.asarray(out_dst, dtype=np.uint64)
        sl = out_src // P
        oorder = np.lexsort((out_dst, sl))
        sl = sl[oorder]
        od = out_dst[oorder]
        out_src = out_dst = oorder = None  # transient-peak control
        out_indptr = np.zeros(n_owned + 1, dtype=np.int64)
        np.cumsum(np.bincount(sl, minlength=n_owned), out=out_indptr[1:])

        return cls(
            pid=pid,
            num_partitions=P,
            n_vertices=n_vertices,
            n_owned=n_owned,
            in_indptr=in_indptr,
            # int32 per-edge arrays: per-partition edge counts and owned-slot
            # ids are < 2^31 by construction (they must fit one worker's
            # heap); halves the bytes streamed per sweep — the kernel is
            # memory-bandwidth-bound
            in_dst_local=dl.astype(np.int32),
            in_src_pos=src_pos.astype(np.int32),
            needed_parts=needed_parts.astype(np.int64),
            needs=needs,
            outdeg=outdeg,
            out_indptr=out_indptr,
            out_dst=od,
            n_hot=n_hot,
            hot_slot=hot_slot,
            hot_src_pos=hot_src_pos,
            own_hot_slots=own_hot_slots,
            own_hot_idx=own_hot_idx,
            hot_idx_of_slot=hot_idx_of_slot,
            in_w=in_w,
            hot_w=np.asarray(hot_w, np.float64) if hot_w is not None else None,
        )

    _CACHE_VERSION = 2

    def _save_cache(self, layout_path: str, n_edges_expected: int) -> None:
        if os.environ.get("GRAFT_CSR_NO_CACHE"):
            # Opt-out for disk-constrained one-shot runs (the npz caches cost
            # ~45% of the layout's footprint at billion-edge scale); every
            # engine start then repays the parquet read + lexsort.
            return
        d = os.path.join(layout_path, "csr_cache")
        os.makedirs(d, exist_ok=True)
        f = os.path.join(d, f"part-{self.pid}.npz")
        tmp = os.path.join(d, f"part-{self.pid}.tmp{os.getpid()}.npz")
        np.savez(
            tmp,
            version=np.int64(self._CACHE_VERSION),
            n_edges_expected=np.int64(n_edges_expected),
            in_indptr=self.in_indptr,
            in_dst_local=self.in_dst_local,
            in_src_pos=self.in_src_pos,
            needed_parts=self.needed_parts,
            needs_flat=np.concatenate(self.needs) if self.needs else np.empty(0, np.int64),
            needs_lens=np.array([len(x) for x in self.needs], np.int64),
            outdeg=self.outdeg,
            out_indptr=self.out_indptr,
            out_dst=self.out_dst,
            hot_slot=self.hot_slot,
            hot_src_pos=self.hot_src_pos,
            own_hot_slots=self.own_hot_slots,
            own_hot_idx=self.own_hot_idx,
            hot_idx_of_slot=self.hot_idx_of_slot,
            weighted=np.int64(self.in_w is not None),
            in_w=self.in_w if self.in_w is not None else np.empty(0),
            hot_w=self.hot_w if self.hot_w is not None else np.empty(0),
        )
        os.replace(tmp, f)

    @classmethod
    def _load_cache(cls, layout_path: str, pid: int, P: int, n: int,
                    n_hot: int, n_edges_expected: int) -> "CsrPartition | None":
        f = os.path.join(layout_path, "csr_cache", f"part-{pid}.npz")
        if not os.path.isfile(f):
            return None
        try:
            z = np.load(f)
            if int(z["version"]) != cls._CACHE_VERSION or \
               int(z["n_edges_expected"]) != n_edges_expected:
                return None
            bounds = np.cumsum(z["needs_lens"])[:-1]
            needs = np.split(z["needs_flat"], bounds) if len(z["needs_lens"]) else []
            return cls(
                pid=pid, num_partitions=P, n_vertices=n,
                n_owned=cls.owned_count(n, pid, P),
                in_indptr=z["in_indptr"], in_dst_local=z["in_dst_local"],
                in_src_pos=z["in_src_pos"], needed_parts=z["needed_parts"],
                needs=needs, outdeg=z["outdeg"], out_indptr=z["out_indptr"],
                out_dst=z["out_dst"], n_hot=n_hot, hot_slot=z["hot_slot"],
                hot_src_pos=z["hot_src_pos"], own_hot_slots=z["own_hot_slots"],
                own_hot_idx=z["own_hot_idx"], hot_idx_of_slot=z["hot_idx_of_slot"],
                in_w=z["in_w"] if int(z["weighted"]) else None,
                hot_w=z["hot_w"] if int(z["weighted"]) else None,
            )
        except Exception:
            return None

    @classmethod
    def from_layout(cls, layout_path: str, pid: int) -> "CsrPartition":
        """Build from the persistent layout written by stages.graph_build
        (reads ONLY this partition's part= directories).  The built CSR is
        cached as one npz per partition inside the layout dir — subsequent
        engine startups skip the parquet read + lexsort (the expensive part
        of pinning state) and load arrays directly."""
        import json

        with open(os.path.join(layout_path, "lineage.json")) as f:
            meta = json.load(f)
        P = meta["num_partitions"]
        n = meta["n_vertices"]
        cached = cls._load_cache(
            layout_path, pid, P, n, meta.get("n_hot", 0), meta["n_edges"]
        )
        if cached is not None:
            return cached

        def read(sub: str, cols: list[str]) -> dict[str, np.ndarray]:
            d = os.path.join(layout_path, sub, f"part={pid}")
            if not os.path.isdir(d):
                return {c: np.empty(0, dtype=np.int64) for c in cols}
            t = pq.read_table(d, columns=cols)
            return {c: t[c].to_numpy(zero_copy_only=False) for c in cols}

        weighted = meta.get("weighted", False)
        ecols = ["src", "dst", "w"] if weighted else ["src", "dst"]
        ein = read("edges_in", ecols)
        eout = read("edges_out", ["src", "dst"])
        degs = read("degrees", ["vid", "deg"])
        hot_vids = hot_src = hot_dst = hot_w = None
        if meta.get("n_hot", 0):
            hot_vids = np.load(os.path.join(layout_path, "hot.npy"))
            ehot = read("edges_in_hot", ecols)
            hot_src, hot_dst = ehot["src"], ehot["dst"]
            hot_w = ehot.get("w")
        # pop: build() gets SOLE ownership of the big endpoint arrays so it
        # can release each one the moment it is consumed (transient-peak
        # control for many-actor first starts at billion-edge scale)
        csr = cls.build(
            pid, P, n,
            ein.pop("src"), ein.pop("dst"), eout.pop("src"), eout.pop("dst"),
            degs["vid"], degs["deg"],
            hot_vids=hot_vids, hot_src=hot_src, hot_dst=hot_dst,
            in_w=ein.pop("w", None), hot_w=hot_w,
        )
        try:
            csr._save_cache(layout_path, meta["n_edges"])
        except OSError:
            pass  # read-only layout dir: cache is best-effort
        return csr

    # ------------------------------------------------------------------
    # kernels
    # ------------------------------------------------------------------

    def gather(self, shards: list[np.ndarray]) -> np.ndarray:
        """Concatenate the needed entries of the fetched shards into the
        contribution value array addressed by ``in_src_pos``."""
        if not shards:
            return np.empty(0, dtype=np.float64)
        return np.concatenate(
            [sh[need] for sh, need in zip(shards, self.needs)]
        )

    def hot_partial(self, cvals: np.ndarray) -> np.ndarray:
        """This partition's partial contribution sum for every GLOBAL hot
        vertex (its src%P shard of their in-edges).  Owners combine the P
        partials — the partial/combine structure that keeps a celebrity
        vertex's in-edge sum spread across the cluster."""
        wts = cvals[self.hot_src_pos]
        if self.hot_w is not None:
            wts = wts * self.hot_w
        return np.bincount(self.hot_slot, weights=wts, minlength=self.n_hot)

    def pull_all(
        self, cvals: np.ndarray, c0: float, damping: float,
        hot_sums: np.ndarray | None = None,
    ) -> np.ndarray:
        """a[v] = C0 + P * sum in-contributions, for every owned vertex
        (`src/pagerank.hxx:203-213` full sweep).  ``hot_sums``: combined hot
        partials (global hot list order); owned hot vertices have no cold
        in-edges, so their rank comes entirely from the combined sums."""
        wts = cvals[self.in_src_pos]
        if self.in_w is not None:
            wts = wts * self.in_w
        sums = np.bincount(self.in_dst_local, weights=wts, minlength=self.n_owned)
        if hot_sums is not None and len(self.own_hot_slots):
            sums[self.own_hot_slots] = hot_sums[self.own_hot_idx]
        return c0 + damping * sums

    def pull_selected(
        self, cvals: np.ndarray, sel: np.ndarray, c0: float, damping: float,
        hot_sums: np.ndarray | None = None,
    ) -> np.ndarray:
        """Ranks for the selected owned slots only (frontier sweep:
        `src/pagerankBasic.hxx:189-201` — only affected vertices touched)."""
        pos, seg = range_gather(self.in_indptr, sel)
        wts = cvals[self.in_src_pos[pos]]
        if self.in_w is not None:
            wts = wts * self.in_w[pos]
        sums = np.bincount(seg, weights=wts, minlength=len(sel))
        if hot_sums is not None and len(self.own_hot_slots):
            hi = self.hot_idx_of_slot[sel]
            m = hi >= 0
            if m.any():
                sums[m] = hot_sums[hi[m]]
        return c0 + damping * sums

    def out_neighbors(self, sel: np.ndarray) -> np.ndarray:
        """Global dst vids of all out-edges of the selected owned slots
        (frontier expansion / seeding, `src/pagerank.hxx:386-391`)."""
        pos, _ = range_gather(self.out_indptr, sel)
        return self.out_dst[pos]
