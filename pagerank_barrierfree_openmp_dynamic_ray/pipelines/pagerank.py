"""The PageRank operator family over partitioned CSR actors.

Re-expresses the six public entry points invoked at ``main.cxx:209-225``:

| reference                                           | here                              |
|-----------------------------------------------------|-----------------------------------|
| pagerankBasicOmp (static)                           | run(mode="barrier")               |
| pagerankBasicOmp with q (naive-dynamic)             | run(mode="barrier", q=...)        |
| pagerankBasicDynamicFrontierOmp                     | run(mode="barrier", frontier=...) |
| pagerankBarrierfreeOmp<true> (static)               | run(mode="barrierfree")           |
| pagerankBarrierfreeOmp<true> warm-start             | run(mode="barrierfree", q=...)    |
| pagerankBarrierfreeDynamicFrontierOmp<true>         | run(mode="barrierfree", frontier=...) |

Defaults mirror ``PagerankOptions`` (`src/pagerank.hxx:50`): damping 0.85,
L-inf tolerance 1e-10, max 500 iterations; the frontier expansion threshold is
``D = 0.001 * tolerance`` (`src/pagerankBasic.hxx:174-185`).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import ray

from ..stages.graph_build import GraphLayout
from ..state.checkpoint import read_lineage, write_lineage
from ..state.partition_actor import CsrPartitionActor, RankBoard


@dataclass
class PageRankResult:
    """Engine analogue of ``PagerankResult`` (`src/pagerank.hxx:60-76`)."""

    ranks: np.ndarray  # dense, indexed by vid
    iterations: int
    wall_s: float
    residual: float
    mode: str
    variant: str
    stats: dict = field(default_factory=dict)

    def top_k(self, k: int) -> list[tuple[int, float]]:
        idx = np.argsort(-self.ranks, kind="stable")[:k]
        return [(int(i), float(self.ranks[i])) for i in idx]


@dataclass
class Frontier:
    """Dynamic-update descriptor: the old graph layout plus the applied
    deletion/insertion batches (endpoint arrays, global vids).

    ``affected``: optional pre-computed affected vid set — the TRAVERSAL
    dynamic rule (`src/pagerank.hxx:306-352`,
    pipelines/traversal.affected_traversal): when set, seeding marks exactly
    this set instead of the frontier expansion rule's batch-endpoint
    out-neighborhoods.  The set is closed under reachability, so in-run
    Δ-expansion can only re-mark vertices already inside it."""

    old_layout: GraphLayout
    del_src: np.ndarray
    ins_src: np.ndarray
    affected: np.ndarray | None = None


def check_init_wave(init_wave: int | None) -> None:
    """Engines call this BEFORE creating actors — a bad wave must fail
    eagerly, not after P actors have been spawned and leaked."""
    if init_wave is not None and init_wave < 1:
        raise ValueError(f"init_wave must be >= 1, got {init_wave}")


def _ready_in_waves(actors: list, init_wave: int | None) -> list[int]:
    """ready() every actor, at most ``init_wave`` first-time CSR builds in
    flight (None = all at once).  The build's transient peak (parquet read +
    lexsort + gather plan) is several GB per partition at 1e9-edge scale;
    un-staggered, P concurrent builds multiply that peak by P and the OS
    OOM-killer takes an actor down.  Once the npz caches exist, reloads are
    cheap and the waves cost nothing."""
    check_init_wave(init_wave)
    if init_wave is None or init_wave >= len(actors):
        return ray.get([a.ready.remote() for a in actors])
    out: list[int] = []
    for i in range(0, len(actors), init_wave):
        out.extend(ray.get(
            [a.ready.remote() for a in actors[i: i + init_wave]]))
    return out


class PageRankEngine:
    """Actor-pool PageRank over a built :class:`GraphLayout`.

    One actor per partition, created once (CSR build amortized across all
    subsequent runs — static, dynamic, with-barrier, barrier-free).
    ``init_wave``: cap on concurrent first-time CSR builds (memory guard at
    billion-edge scale); None = build all partitions at once.
    """

    def __init__(self, layout: GraphLayout, num_cpus_per_actor: float = 1.0,
                 init_wave: int | None = None):
        check_init_wave(init_wave)
        self.layout = layout
        self.P = layout.num_partitions
        self.n = layout.n_vertices
        self._num_cpus = num_cpus_per_actor
        self.actors = [
            CsrPartitionActor.options(num_cpus=num_cpus_per_actor).remote(
                layout.path, pid
            )
            for pid in range(self.P)
        ]
        self.owned = _ready_in_waves(self.actors, init_wave)

    def _rebuild_actor(self, pid: int, frontier_on: bool,
                       checkpoint_dir: str | None) -> None:
        """Crash recovery (`main.cxx:156-169` crash-stop model): a dead
        partition actor is recreated from the persistent layout; its ranks
        come from the newest checkpoint when one exists, else restart at
        1/N.  In frontier mode without a checkpoint, ALL owned slots are
        re-marked affected (a monotone superset — lost flags can only be
        over-approximated safely)."""
        from ..state.checkpoint import latest_checkpoint
        from ..state.csr import CsrPartition

        a = CsrPartitionActor.options(num_cpus=self._num_cpus).remote(
            self.layout.path, pid
        )
        ray.get(a.ready.remote())
        ray.get(a.init_ranks.remote(None))
        ray.get(a.set_frontier_mode.remote(frontier_on))
        ck = latest_checkpoint(checkpoint_dir) if checkpoint_dir else None
        if ck is not None:
            ray.get(a.load_checkpoint.remote(ck))
        elif frontier_on:
            n_owned = CsrPartition.owned_count(self.n, pid, self.P)
            ray.get(a.mark_affected.remote(np.arange(n_owned, dtype=np.int64)))
        self.actors[pid] = a

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    # ------------------------------------------------------------------
    def _scatter_q(self, q: np.ndarray | None, rank_dtype: str = "float64"):
        """Warm-start ranks -> owner shards (vid % P owns, slot vid // P)."""
        if q is None:
            ray.get([a.init_ranks.remote(None, rank_dtype) for a in self.actors])
        else:
            ray.get(
                [
                    a.init_ranks.remote(
                        np.ascontiguousarray(q[p:: self.P]), rank_dtype
                    )
                    for p, a in enumerate(self.actors)
                ]
            )

    def _seed_frontier(self, fr: Frontier) -> None:
        """vaff seeding (`src/pagerank.hxx:386-391`): out-neighbors of
        deletion sources in the OLD graph, of insertion sources in the NEW
        graph.  Old-graph adjacency is read from the old layout's
        ``edges_out`` partitions (only the parts owning a deletion source).
        A pre-computed ``affected`` set (traversal variant) is marked
        verbatim instead."""
        if fr.affected is not None:
            vids = np.unique(np.asarray(fr.affected, dtype=np.int64))
            vids = vids[(vids >= 0) & (vids < self.n)]
            futs = []
            for p in range(self.P):
                mine = vids[vids % self.P == p] // self.P
                if len(mine):
                    futs.append(self.actors[p].mark_affected.remote(mine))
            ray.get(futs)
            return
        marks = []
        ds = np.unique(np.asarray(fr.del_src, dtype=np.int64))
        if len(ds):
            marks.append(out_neighbors_from_layout(fr.old_layout, ds))
        ins = np.unique(np.asarray(fr.ins_src, dtype=np.int64))
        if len(ins):
            futs = []
            for p in np.unique(ins % self.P):
                futs.append(
                    self.actors[int(p)].out_neighbors_of.remote(ins[ins % self.P == p])
                )
            marks.extend(ray.get(futs))
        if marks:
            vids = np.unique(np.concatenate(marks)).astype(np.int64)
            vids = vids[vids < self.n]
            futs = []
            for p in range(self.P):
                mine = vids[vids % self.P == p] // self.P
                if len(mine):
                    futs.append(self.actors[p].mark_affected.remote(mine))
            ray.get(futs)

    # ------------------------------------------------------------------
    def run(
        self,
        mode: str = "barrier",
        q: np.ndarray | None = None,
        frontier: Frontier | None = None,
        damping: float = 0.85,
        tol: float = 1e-10,
        max_iter: int = 500,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        fault=None,
        resume_from: str | None = None,
        norm: str = "linf",
        dead: bool = False,
        collect: bool = True,
        board_shards: int | None = None,
        rank_dtype: str = "float64",
    ) -> PageRankResult:
        """``dead=True`` enables the teleport treatment of dead ends
        (``pagerankTeleport``, `src/pagerank.hxx:157-184`; barrier-free
        nowait variant `src/pagerankBarrierfree.hxx:30-43`): each iteration
        redistributes Σ_{deg(u)=0} r[u] uniformly via C0 instead of relying
        on the self-loop trick — use on layouts built with
        ``add_loops=False``.  Frontier mode is incompatible (a moving C0
        touches every vertex each sweep).

        ``collect=False`` skips materializing the dense |V| rank vector on
        the driver (``result.ranks is None``); consume the ranks
        Dataset-natively instead via ``checkpoint_dir`` +
        ``state.checkpoint.ranks_dataset``/``rank_topk`` — the required
        shape once |V| outgrows one machine.

        ``rank_dtype="float32"`` is the reference's TYPE compile flag: rank
        vectors and contribution shards are stored/shipped as float32
        (HALF the bytes per sweep — the kernel is bandwidth-bound) with
        float64 accumulation inside the pull; use tolerances >= ~1e-6."""
        variant = (
            "frontier" if frontier is not None else ("naive" if q is not None else "static")
        )
        if frontier is not None and frontier.affected is not None:
            variant = "traversal"
        if resume_from is not None:
            meta = read_lineage(resume_from)
            variant = meta.get("variant", variant)
        c0 = (1.0 - damping) / self.n
        frontier_on = frontier is not None or variant == "frontier"
        frontier_d = 0.001 * tol if frontier_on else None
        if dead and frontier_on:
            raise ValueError("dead (teleport) mode is incompatible with the "
                             "dynamic frontier: a moving C0 re-ranks every "
                             "vertex each sweep")

        if np.dtype(rank_dtype) == np.float32 and tol < 1e-7:
            raise ValueError("rank_dtype='float32' cannot converge below "
                             "~1e-7; raise tol or use float64")
        t0 = time.perf_counter()
        self._swept_vertices = None  # set by the superstep loop
        self._crashed_parts = 0  # fault-injection crash count (both modes)
        self._scatter_q(q, rank_dtype)
        ray.get([a.set_frontier_mode.remote(frontier_on) for a in self.actors])
        if frontier is not None:
            self._seed_frontier(frontier)
        if resume_from is not None:
            # checkpoint carries ranks AND the affected flags of its lineage
            ray.get([a.load_checkpoint.remote(resume_from) for a in self.actors])

        if mode == "barrier":
            iters, residual = self._run_superstep(
                c0, damping, tol, max_iter, frontier_d,
                checkpoint_dir, checkpoint_every, variant, norm, fault,
                dead=dead,
            )
        elif mode == "barrierfree":
            if norm != "linf":
                # the reference's barrier-free path supports only L-inf
                # (per-vertex converged flags, `src/pagerankBarrierfree.hxx:215`)
                raise ValueError("barrier-free mode supports only norm='linf'")
            iters, residual = self._run_barrierfree(
                c0, damping, tol, max_iter, frontier_d, fault,
                checkpoint_dir, checkpoint_every, variant, dead=dead,
                board_shards=board_shards,
            )
        else:
            raise ValueError(f"unknown mode {mode!r}")

        ranks = self.collect_ranks() if collect else None
        wall = time.perf_counter() - t0
        if checkpoint_dir:
            self.checkpoint(checkpoint_dir, iters, residual, mode, variant)
        return PageRankResult(
            ranks=ranks,
            iterations=iters,
            wall_s=wall,
            residual=residual,
            mode=mode,
            variant=variant,
            stats={"num_partitions": self.P, "n_vertices": self.n,
                   "n_edges": self.layout.n_edges,
                   "swept_vertices": getattr(self, "_swept_vertices", None),
                   "crashed_partitions": getattr(self, "_crashed_parts", 0)},
        )

    # ------------------------------------------------------------------
    def _run_superstep(
        self, c0, damping, tol, max_iter, frontier_d,
        checkpoint_dir, checkpoint_every, variant, norm="linf", fault=None,
        dead=False,
    ):
        """With-barrier loop (`src/pagerankBasic.hxx:53-68`): double-buffered
        shards, one global residual reduce per iteration.  ``norm``: the
        residual reduction — "linf" (max, the default, `src/_vector.hxx:410`),
        "l1" (sum abs, `:264`), or "l2" (sqrt sum sq, `:337`)."""
        shard_refs = [a.shard.remote() for a in self.actors]
        hot_on = self.layout.n_hot > 0
        iters, residual = 0, float("inf")
        self._swept_vertices = 0  # total vertex-sweeps (frontier-savings meter)
        fd = frontier_d
        # DEAD mode: the teleport C0 folds the previous iteration's dead-end
        # mass (initially from the scattered/warm ranks); partials ride back
        # on each step's stats so no extra round-trip is ever paid
        dead_total = (
            sum(ray.get([a.dead_mass.remote() for a in self.actors]))
            if dead else 0.0
        )
        # crash-stop bookkeeping: a partition crashes at most once per run
        # (see the rebuild branch below for why), but keeps its SLEEP
        # injection afterwards — only the crash knobs are stripped
        crash_done: set = set()

        def _fault_for(p: int):
            if not fault or p not in fault.get("pids", range(self.P)):
                return None
            if p in crash_done:
                f2 = {k: v for k, v in fault.items()
                      if k not in ("crash_prob", "crash_at")}
                return f2 if (f2.get("sleep_prob") or f2.get("sleep_prob_v")) \
                    else None
            return fault

        while iters < max_iter:
            c0_t = c0 + damping * dead_total / self.n if dead else c0
            hot_sums = None
            if hot_on:
                # phase A (skew split): every partition gathers + returns its
                # hot partials; the driver combines the (tiny) vectors and
                # feeds them to phase B, which reuses the cached gather.
                parts = ray.get(
                    [a.hot_partial_step.remote(shard_refs) for a in self.actors]
                )
                hot_sums = np.sum(parts, axis=0)
            futs = [
                a.step.options(num_returns=2).remote(
                    None if hot_on else shard_refs, c0_t, damping, tol, fd,
                    hot_sums, _fault_for(p),
                )
                for p, a in enumerate(self.actors)
            ]
            shard_refs = [f[0] for f in futs]
            if fault and (fault.get("crash_at") is not None
                          or fault.get("crash_prob")):
                # crash-stop path: fetch stats per actor so one death does
                # not poison the barrier; rebuild and REDO the iteration
                # (survivors' extra sweep is harmless — power iteration
                # converges from any perturbed state)
                stats, died = [], []
                for p, f in enumerate(futs):
                    try:
                        stats.append(ray.get(f[1]))
                    except ray.exceptions.RayActorError:
                        died.append(p)
                if died:
                    self._crashed_parts += len(died)
                    # CRASH-STOP SEMANTICS (one crash per partition, both
                    # knobs): the reference's model is a permanently dead
                    # thread (`README.md:110-127` — barrier-free survivors
                    # converge around it); the with-barrier recovery
                    # analogue rebuilds the partition ONCE and exempts it
                    # from further crash draws.  This is deliberate, not a
                    # memoryless process: a rebuilt partition restarts at
                    # 1/N (no checkpoint), and re-eligible crashes at any
                    # test-visible rate re-perturb faster than the ~115
                    # synchronous sweeps the 1e-10 tail needs — measured
                    # 500-iteration non-convergence at p=2e-3.  Rebuilt
                    # partitions DO keep their sleep injection (_fault_for
                    # strips only the crash knobs), and the caller's fault
                    # dict is never mutated.
                    crash_done.update(died)
                    # survivors swept this iteration: their frontier marks
                    # must not be lost across the redo
                    for s in stats:
                        for p, arr in s["marks"].items():
                            self.actors[p].mark_affected.remote(arr)
                    gens = getattr(self, "_rebuild_gen", {})
                    self._rebuild_gen = gens
                    for p in died:
                        self._rebuild_actor(p, frontier_d is not None,
                                            checkpoint_dir)
                        gens[p] = gens.get(p, 0) + 1
                        self.actors[p].reseed_fault.remote(gens[p])
                    # dead actors' shard returns died with them — refresh all
                    shard_refs = [a.shard.remote() for a in self.actors]
                    if dead:
                        dead_total = sum(
                            ray.get([a.dead_mass.remote() for a in self.actors])
                        )
                    continue
            else:
                stats = ray.get([f[1] for f in futs])
            iters += 1
            if dead:
                dead_total = sum(s["dead"] for s in stats)
            self._swept_vertices += sum(s["n_active"] for s in stats)
            if norm == "l1":
                residual = sum(s["l1"] for s in stats)
            elif norm == "l2":
                residual = sum(s["l2sq"] for s in stats) ** 0.5
            else:
                residual = max(s["linf"] for s in stats)
            # frontier saturation: once every vertex everywhere is affected,
            # expansion can mark nothing new (vaff is monotone) — stop paying
            # for out-neighbor scans; sweep coverage is unchanged
            if fd is not None and all(
                s["n_active"] == s["n_owned"] for s in stats
            ):
                fd = None
            # route cross-partition frontier marks before the next superstep
            # (actor task order per caller guarantees they apply first)
            combined: dict[int, list] = {}
            for s in stats:
                for p, arr in s["marks"].items():
                    combined.setdefault(p, []).append(arr)
            for p, arrs in combined.items():
                self.actors[p].mark_affected.remote(np.unique(np.concatenate(arrs)))
            if checkpoint_dir and checkpoint_every and iters % checkpoint_every == 0:
                self.checkpoint(checkpoint_dir, iters, residual, "barrier", variant)
            if residual < tol:
                break
        return iters, residual

    # partitions per board shard before the barrier-free board sharding
    # kicks in.  A single RankBoard serves a sync in ~2.4 ms, so it saturates
    # around P in the low hundreds; below that the sharded protocol's second
    # hop (home sync + peer get_refs) only adds latency — measured 2.5x
    # slower at P=16.  Default engages at cluster-scale P only; force with
    # run(board_shards=...) (the sharded protocol is oracle-verified in
    # tests at B=2..3).
    BOARD_SHARD_FACTOR = 32

    def _run_barrierfree(self, c0, damping, tol, max_iter, frontier_d, fault,
                         checkpoint_dir=None, checkpoint_every=0,
                         variant="static", dead=False, board_shards=None):
        """Barrier-free: every actor loops independently against the board;
        the driver only awaits completion (no per-iteration ray.get barrier).
        Checkpoints are barrier-less too: each actor persists its own slice
        every ``checkpoint_every`` LOCAL iterations into ``<dir>/async`` —
        mixed-iteration parts are valid barrier-free state to resume from.

        The board is SHARDED once P exceeds ``BOARD_SHARD_FACTOR``
        partitions per shard (override with ``board_shards``): each shard
        owns refs/flags/mailboxes for P/B partitions, cross-shard frontier
        marks are forwarded board-to-board, and a tiny coordinator decides
        termination by message counting — removes the single-actor sync
        funnel the round-1 review flagged for P=512."""
        from ..state.partition_actor import BoardCoordinator, RankBoardShard

        ck = None
        if checkpoint_dir and checkpoint_every:
            ck = os.path.join(checkpoint_dir, "async")
            os.makedirs(ck, exist_ok=True)
            # lineage is written UP FRONT so a mid-run crash (the scenario
            # async checkpoints exist for) leaves a resumable dir: resume
            # only needs variant/graph identity, not the final iteration
            # count, which is refreshed after completion (ADVICE r01)
            write_lineage(ck, 0, float("nan"), "barrierfree", variant,
                          self.layout.path, self.P, self.n)
        B = board_shards if board_shards is not None else max(
            1, self.P // self.BOARD_SHARD_FACTOR
        )
        if B > 1:
            coord = BoardCoordinator.remote(B)
            shards = [
                RankBoardShard.remote(b, B, self.P, coord) for b in range(B)
            ]
            ray.get([s.set_peers.remote(shards) for s in shards])
            board = (shards, coord)
            kill_list = [*shards, coord]
        else:
            board = RankBoard.remote(self.P)
            kill_list = [board]
        futs = [
            a.run_async.remote(
                board, c0, damping, tol, frontier_d, max_iter,
                fault if fault and p in fault.get("pids", range(self.P)) else None,
                ck, checkpoint_every, dead,
            )
            for p, a in enumerate(self.actors)
        ]
        infos = ray.get(futs)
        iters = max(i["iterations"] for i in infos)  # threadInfosMaxIteration
        self._crashed_parts = sum(1 for i in infos if i.get("crashed"))
        if ck is not None:
            write_lineage(ck, iters, float("nan"), "barrierfree", variant,
                          self.layout.path, self.P, self.n)
        for h in kill_list:
            ray.kill(h)
        return iters, float("nan")

    # ------------------------------------------------------------------
    def collect_ranks(self) -> np.ndarray:
        shards = ray.get([a.ranks.remote() for a in self.actors])
        out = np.empty(self.n, dtype=np.float64)
        for p, sh in enumerate(shards):
            out[p:: self.P] = sh
        return out

    def checkpoint(self, root: str, iteration: int, residual, mode: str, variant: str) -> str:
        d = os.path.join(root, f"iter-{iteration}")
        os.makedirs(d, exist_ok=True)
        ray.get([a.write_checkpoint.remote(d) for a in self.actors])
        write_lineage(
            d, iteration, float(residual), mode, variant,
            self.layout.path, self.P, self.n,
        )
        return d


def out_neighbors_from_layout(layout: GraphLayout, srcs: np.ndarray) -> np.ndarray:
    """Out-neighbors of ``srcs`` read straight from a persistent layout —
    touches only the ``edges_out/part=p`` directories owning a source (the
    old-graph side of frontier seeding needs no live actors)."""
    import pyarrow.parquet as pq

    srcs = np.unique(np.asarray(srcs, dtype=np.int64))
    P = layout.num_partitions
    out = []
    for p in np.unique(srcs % P):
        d = os.path.join(layout.edges_out, f"part={int(p)}")
        if not os.path.isdir(d):
            continue
        t = pq.read_table(d, columns=["src", "dst"])
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(s, srcs)
        out.append(t["dst"].to_numpy(zero_copy_only=False)[m].astype(np.int64))
    return np.unique(np.concatenate(out)) if out else np.empty(0, np.int64)
