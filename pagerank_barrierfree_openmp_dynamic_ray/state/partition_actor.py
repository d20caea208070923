"""Partition actors: the stateful stage of the PageRank engine.

One ``CsrPartitionActor`` per partition, pinned for the whole computation
(the Ray analogue of the reference's shared-heap graph + rank vectors read by
all OpenMP threads, SURVEY §2.3).  Two execution protocols:

- **superstep (with-barrier)**: the driver calls ``step`` on every actor each
  iteration and reduces the L-inf partials — semantics of
  ``pagerankBasicOmpLoop`` (`src/pagerankBasic.hxx:53-68`): double-buffered,
  deterministic, a global barrier per iteration.
- **barrier-free (async)**: each actor runs ``run_async`` — a local loop that
  pulls the freshest contribution shards from the :class:`RankBoard`, sweeps,
  publishes, and keeps going with NO global barrier; per-vertex converged
  flags replace the global residual, termination is "all partitions report
  all-converged" — semantics of ``pagerankBarrierfreeOmpLoop``
  (`src/pagerankBarrierfree.hxx:213-235`): a thread maps to a partition
  actor, ``nowait`` maps to the absence of any ``ray.get`` barrier, the
  per-thread iteration counter maps to the per-partition counter, and stale
  reads are tolerated because they only delay the fixed point (the
  reference's own correctness argument, `README.md:90-94`).

Frontier semantics (both protocols): the affected set is monotone (the
reference never clears ``vaff``); a vertex whose sweep delta exceeds
``D = 0.001 * tolerance`` marks all out-neighbors in the new graph affected
(`src/pagerankBasic.hxx:195-196`, `src/pagerankBarrierfree.hxx:326`).
"""

from __future__ import annotations

import time

import numpy as np
import ray

from .csr import CsrPartition


@ray.remote
class RankBoard:
    """Shared-memory stand-in for the barrier-free mode: holds the freshest
    contribution-shard object refs, per-partition converged flags, and the
    cross-partition frontier mailboxes.  All methods are tiny; shard payloads
    live in the object store, never in the board."""

    def __init__(self, num_partitions: int):
        self.P = num_partitions
        self.shard_refs: list = [None] * num_partitions
        self.converged = np.zeros(num_partitions, dtype=bool)
        self.iterations = np.zeros(num_partitions, dtype=np.int64)
        self.inbox: list[list] = [[] for _ in range(num_partitions)]
        self.hot_partials: dict[int, np.ndarray] = {}
        self._hot_sum: np.ndarray | None = None
        self.dead_partials: dict[int, float] = {}
        self.stopped = False

    def dead_exchange(self, pid: int, mass: float) -> float:
        """Barrier-free DEAD-mode combine (`src/pagerankBarrierfree.hxx:30-43`
        nowait teleport rank sum): publish this partition's freshest owned
        dead-end rank mass, get back the global sum over every partition's
        freshest (stale partials tolerated — same fixed-point argument)."""
        self.dead_partials[pid] = float(mass)
        return float(sum(self.dead_partials.values()))

    def hot_exchange(self, pid: int, partial: np.ndarray) -> np.ndarray:
        """Barrier-free hot-vertex combine: publish this partition's freshest
        hot partial-sum vector, get back the sum over every partition's
        freshest (stale partials tolerated — same fixed-point argument as
        stale shards).  Payloads are n_hot-sized, tiny by construction.
        The sum is maintained INCREMENTALLY (subtract the caller's previous
        partial, add the new one): O(n_hot) per call instead of O(P*n_hot),
        so the board stays off the critical path at large P.  FP drift from
        incremental updates is far below the convergence tolerance and is
        absorbed by the barrier-free staleness argument."""
        old = self.hot_partials.get(pid)
        if self._hot_sum is None:
            self._hot_sum = np.zeros_like(partial)
        if old is not None:
            self._hot_sum -= old
        self._hot_sum += partial
        self.hot_partials[pid] = partial
        return self._hot_sum.copy()

    def sync(self, pid: int, shard_ref_box: list, converged: bool, iteration: int, marks):
        """Atomically publish this partition's state and fetch the freshest
        view.  ``shard_ref_box`` is a 1-element list holding the ObjectRef —
        boxed because Ray auto-resolves bare refs in top-level actor args.
        ``marks``: dict part -> np.ndarray of local slots to mark affected
        (frontier expansion crossing partitions)."""
        self.shard_refs[pid] = shard_ref_box[0]
        self.iterations[pid] = iteration
        if marks:
            for p, arr in marks.items():
                if p != pid:
                    self.inbox[p].append(arr)
        mail = self.inbox[pid]
        self.inbox[pid] = []
        # a partition handed pending frontier marks is by definition not done
        self.converged[pid] = bool(converged) and not mail
        if bool(self.converged.all()) and not any(len(b) for b in self.inbox):
            self.stopped = True
        return list(self.shard_refs), self.stopped, mail

    def max_iteration(self) -> int:
        return int(self.iterations.max())


@ray.remote
class BoardCoordinator:
    """Tiny global-state actor for the SHARDED barrier-free board: decides
    termination and combines the (small) hot/dead partials.  Boards report
    (clean, marks_sent, marks_received) ON CHANGE only; global stop is
    declared when every board is clean AND the cumulative cross-board mark
    counters balance (Safra-style message counting — a frontier mark still
    in flight makes sent > recv, so termination can never race past it).
    ``stopped`` is sticky, matching the single-board semantics."""

    def __init__(self, num_boards: int):
        self.clean = np.zeros(num_boards, dtype=bool)
        self.sent = np.zeros(num_boards, dtype=np.int64)
        self.recv = np.zeros(num_boards, dtype=np.int64)
        self.stopped = False
        self.hot_partials: dict[int, np.ndarray] = {}
        self._hot_sum: np.ndarray | None = None
        self.dead_partials: dict[int, float] = {}

    def report(self, bid: int, clean: bool, sent: int, recv: int) -> bool:
        self.clean[bid] = clean
        self.sent[bid] = sent
        self.recv[bid] = recv
        if bool(self.clean.all()) and int(self.sent.sum()) == int(self.recv.sum()):
            self.stopped = True
        return self.stopped

    def stopped_q(self) -> bool:
        return self.stopped

    def hot_exchange(self, pid: int, partial: np.ndarray) -> np.ndarray:
        old = self.hot_partials.get(pid)
        if self._hot_sum is None:
            self._hot_sum = np.zeros_like(partial)
        if old is not None:
            self._hot_sum -= old
        self._hot_sum += partial
        self.hot_partials[pid] = partial
        return self._hot_sum.copy()

    def dead_exchange(self, pid: int, mass: float) -> float:
        self.dead_partials[pid] = float(mass)
        return float(sum(self.dead_partials.values()))


@ray.remote
class RankBoardShard:
    """1/B of the barrier-free board state: owns the contribution-shard
    refs, converged flags and frontier mailboxes of the partitions with
    ``pid % B == bid``.  Publishing partitions call ONLY their home shard,
    so the per-sweep serialization point scales out with B; cross-shard
    frontier marks are forwarded board-to-board (counted at the
    coordinator, see :class:`BoardCoordinator`)."""

    def __init__(self, bid: int, num_boards: int, num_partitions: int,
                 coordinator):
        self.bid = bid
        self.B = num_boards
        self.P = num_partitions
        self.coord = coordinator
        self.peers: list | None = None
        mine = range(bid, num_partitions, num_boards)
        self.shard_refs: dict[int, object] = {p: None for p in mine}
        self.conv: dict[int, bool] = {p: False for p in mine}
        self.iterations: dict[int, int] = {p: 0 for p in mine}
        self.inbox: dict[int, list] = {p: [] for p in mine}
        self.sent = 0
        self.recv = 0
        self.stopped = False
        self._last_report: tuple | None = None

    def set_peers(self, peers: list) -> None:
        self.peers = peers

    def _clean(self) -> bool:
        return all(self.conv.values()) and not any(self.inbox.values())

    def _maybe_report(self) -> None:
        state = (self._clean(), self.sent, self.recv)
        if state != self._last_report:
            self._last_report = state
            if ray.get(self.coord.report.remote(self.bid, *state)):
                self.stopped = True
        elif state[0] and not self.stopped:
            # locally clean but not yet stopped: poll for the sticky global
            # stop (another board may have reported last) — this chatter
            # only happens near termination
            if ray.get(self.coord.stopped_q.remote()):
                self.stopped = True

    def deposit(self, pid: int, arr: np.ndarray) -> None:
        """A peer board forwarded frontier marks for one of our partitions."""
        self.inbox[pid].append(arr)
        self.recv += 1
        self.conv[pid] = False  # pending mail means not converged
        self._maybe_report()

    def sync(self, pid: int, shard_ref_box: list, converged: bool,
             iteration: int, marks) -> tuple:
        self.shard_refs[pid] = shard_ref_box[0]
        self.iterations[pid] = iteration
        if marks:
            for q, arr in marks.items():
                if q == pid:
                    continue
                if q % self.B == self.bid:
                    self.inbox[q].append(arr)
                    self.conv[q] = False
                else:
                    self.sent += 1
                    self.peers[q % self.B].deposit.remote(q, arr)
        mail = self.inbox[pid]
        self.inbox[pid] = []
        self.conv[pid] = bool(converged) and not mail
        self._maybe_report()
        return dict(self.shard_refs), self.stopped, mail

    def get_refs(self, pids: list) -> list:
        """Freshest refs of the requested owned partitions (for consumers
        homed on other boards)."""
        return [self.shard_refs[int(p)] for p in pids]

    def max_iteration(self) -> int:
        return max(self.iterations.values()) if self.iterations else 0


class _SingleBoardView:
    """In-actor adapter: one protocol for ``run_async`` over either board
    flavor.  Single-board: the classic one-call-per-sweep exchange."""

    def __init__(self, board, pid: int, needed_parts):
        self.board = board
        self.pid = pid
        self.needed = [int(p) for p in needed_parts]

    def exchange(self, ref, conv, it, marks):
        shard_refs, stop, mail = ray.get(
            self.board.sync.remote(self.pid, [ref], conv, it, marks)
        )
        return {p: shard_refs[p] for p in self.needed}, stop, mail

    def hot_exchange(self, partial):
        return ray.get(self.board.hot_exchange.remote(self.pid, partial))

    def dead_exchange(self, mass):
        return ray.get(self.board.dead_exchange.remote(self.pid, mass))


class _ShardedBoardView:
    """Sharded flavor: publish to the HOME shard only; fetch the refs this
    partition's gather plan needs from each owning shard in parallel (the
    home sync overlaps the peer get_refs round-trips).  Hot/dead partials
    go to the coordinator (n_hot-sized, incremental sums)."""

    def __init__(self, boards, coordinator, pid: int, needed_parts):
        self.B = len(boards)
        self.pid = pid
        self.home = boards[pid % self.B]
        self.coord = coordinator
        self.by_board: dict[int, list[int]] = {}
        for p in (int(x) for x in needed_parts):
            b = p % self.B
            if b != pid % self.B:
                self.by_board.setdefault(b, []).append(p)
        self.boards = boards
        self.needed = [int(p) for p in needed_parts]

    def exchange(self, ref, conv, it, marks):
        futs = {
            b: self.boards[b].get_refs.remote(pids)
            for b, pids in self.by_board.items()
        }
        own_refs, stop, mail = ray.get(
            self.home.sync.remote(self.pid, [ref], conv, it, marks)
        )
        refs = {p: own_refs[p] for p in self.needed if p % self.B == self.pid % self.B}
        for b, pids in self.by_board.items():
            for p, r in zip(pids, ray.get(futs[b])):
                refs[p] = r
        return refs, stop, mail

    def hot_exchange(self, partial):
        return ray.get(self.coord.hot_exchange.remote(self.pid, partial))

    def dead_exchange(self, mass):
        return ray.get(self.coord.dead_exchange.remote(self.pid, mass))


def _fault_draw(fault: dict, rng, it: int, n_owned: int) -> bool:
    """One per-sweep fault draw; returns True -> crash-stop this partition.

    The reference injects faults PER VERTEX inside the rank loop
    (`main.cxx:137-169`: crash with probability ``crash_prob`` and sleep
    ``sleep_s`` with probability ``sleep_prob_v`` at each vertex; the grid in
    `main.sh:33-42` sweeps those probabilities).  The vectorized equivalent
    over a partition's ``n_owned`` vertices: total sleep this sweep is
    ``Binomial(n_owned, sleep_prob_v) * sleep_s`` and a crash fires with
    probability ``1 - (1 - crash_prob)^n_owned`` — identical distribution to
    per-vertex draws, one rng call instead of n.  The per-PARTITION knobs
    (``sleep_prob`` per sweep, ``crash_at`` a fixed local iteration) remain
    for deterministic tests."""
    if fault.get("crash_at") is not None and it >= fault["crash_at"]:
        return True
    p = fault.get("crash_prob")
    if p and rng.random() < -np.expm1(n_owned * np.log1p(-p)):
        return True
    sleep_s = fault.get("sleep_s", 0.05)
    if fault.get("sleep_prob") and rng.random() < fault["sleep_prob"]:
        time.sleep(sleep_s)
    pv = fault.get("sleep_prob_v")
    if pv:
        k = int(rng.binomial(n_owned, pv))
        if k:
            time.sleep(k * sleep_s)
    return False


@ray.remote
class CsrPartitionActor:
    """Holds one partition's CSR block + rank/flag vectors.

    Construction cost (parquet read + CSR build + gather plan) is paid once;
    every technique (static / naive-dynamic / frontier, with-barrier /
    barrier-free) reuses the same pinned state — the reference builds the
    graph once and runs six techniques over it (`main.cxx:209-225`).
    """

    def __init__(self, layout_path: str, pid: int):
        # CSR construction is deferred to ready(): the first-time build
        # (parquet read + lexsort + gather plan) transiently needs several
        # GB at 1e9-edge scale, and actor __init__ runs EAGERLY on creation
        # — P concurrent builds would multiply that peak by P.  Engines
        # stagger the ready() calls in waves instead (init_wave).
        self._layout_path = layout_path
        self.pid = pid
        self.csr: CsrPartition | None = None

    def _require_csr(self) -> None:
        """Lazy-init protocol guard (ADVICE r04): every non-``ready`` entry
        point needs the CSR built first; a stray call on a fresh actor gets
        a clear error instead of an opaque ``None`` dereference."""
        if self.csr is None:
            raise RuntimeError(
                "CsrPartitionActor: call ready() before any other method — "
                "CSR init is deferred so engines can stagger the build "
                "waves (init_wave) and bound per-node init memory")

    # -------------------------------------------------- initialization
    def ready(self) -> int:
        if self.csr is None:
            self.csr = CsrPartition.from_layout(self._layout_path, self.pid)
            n = self.csr.n_owned
            self.r = np.zeros(n, dtype=np.float64)
            self.vaff = np.zeros(n, dtype=bool)  # frontier flags (monotone)
            self.conv = np.zeros(n, dtype=bool)  # barrier-free converged
            self.frontier_mode = False
            self._dead_mask = self.csr.outdeg == 0  # DEAD-mode teleport set
            self._step_count = 0  # local superstep counter (crash injection)
        return self.csr.n_owned

    def init_ranks(self, q: np.ndarray | None, dtype: str = "float64") -> None:
        """q = warm-start ranks for owned slots (naive-dynamic / frontier,
        `src/pagerank.hxx:488-489`) else 1/N.  ``dtype``: the rank/shard
        element type (the reference's TYPE compile flag) — "float32" halves
        the bytes each contribution shard ships per sweep (the kernel is
        bandwidth-bound), at ~1e-6 rank precision."""
        self._require_csr()
        dt = np.dtype(dtype)
        if self.r.dtype != dt:
            self.r = np.zeros(self.csr.n_owned, dtype=dt)
        if q is None:
            self.r[:] = 1.0 / self.csr.n_vertices
        else:
            self.r[:] = q
        self.conv[:] = False
        self._step_count = 0  # crash_at counts iterations of the CURRENT run

    def reseed_fault(self, salt: int) -> None:
        """Re-salt the superstep fault rng after a crash rebuild: a rebuilt
        actor would otherwise replay the [pid, 987] sequence from the start,
        making a first-draw crash deterministic-forever instead of the
        memoryless per-vertex model (`main.cxx:137-169`)."""
        self._fault_rng = np.random.default_rng([self.pid, 987, salt])

    def set_frontier_mode(self, on: bool) -> None:
        """on=False -> every vertex affected every sweep (static/naive);
        on=True -> only ``vaff`` vertices sweep (dynamic frontier)."""
        self._require_csr()
        self.frontier_mode = on
        self.vaff[:] = False

    def mark_affected(self, local_slots: np.ndarray) -> None:
        if len(local_slots):
            self.vaff[local_slots] = True

    def out_neighbors_of(self, vids: np.ndarray) -> np.ndarray:
        """Global out-neighbors of the given OWNED vids (frontier seeding:
        out-edges of batch endpoints, `src/pagerank.hxx:386-391`)."""
        self._require_csr()
        sel = np.asarray(vids, dtype=np.int64) // self.csr.num_partitions
        sel = np.unique(sel)
        sel = sel[self.csr.out_indptr[sel + 1] > self.csr.out_indptr[sel]]
        return np.unique(self.csr.out_neighbors(sel))

    def shard(self) -> np.ndarray:
        """Contribution shard c[v] = r[v]/outdeg[v] for owned slots — what
        other partitions read (the owner publishes rank/deg so degree never
        ships: `src/pagerank.hxx:208-210` reads xt.vertexValue(u) locally)."""
        self._require_csr()
        out = np.zeros_like(self.r)
        nz = self.csr.outdeg > 0
        out[nz] = self.r[nz] / self.csr.outdeg[nz]
        return out

    def ranks(self) -> np.ndarray:
        return self.r

    def set_ranks(self, r: np.ndarray) -> None:
        self.r = np.asarray(r, dtype=np.float64).copy()

    def affected_flags(self) -> np.ndarray:
        return self.vaff

    def dead_mass(self) -> float:
        """Owned dead-end rank mass Σ_{deg(v)=0} r[v] (the per-partition
        partial of ``pagerankTeleport``'s teleport sum,
        `src/pagerank.hxx:163-169`)."""
        return float(self.r[self._dead_mask].sum())

    # -------------------------------------------------- superstep protocol
    def _sweep(self, cvals, c0, damping, tol, frontier_d, hot_sums=None):
        """One local sweep.  Returns (linf, marks, n_active) and updates
        self.r / self.conv in place.  ``hot_sums``: combined partial sums for
        the global hot-vertex list (skew split), or None."""
        csr = self.csr
        if self.frontier_mode:
            sel = np.flatnonzero(self.vaff)
            if len(sel) == 0:
                self.conv[:] = True
                self._norms = (0.0, 0.0, 0.0)
                return 0.0, {}, 0
            a = csr.pull_selected(cvals, sel, c0, damping, hot_sums).astype(
                self.r.dtype, copy=False)
            delta = np.abs(a - self.r[sel])
            self.r[sel] = a
            self.conv[sel] = delta <= tol
            hot = sel[delta > frontier_d] if frontier_d is not None else sel[:0]
        else:
            sel = None
            a = csr.pull_all(cvals, c0, damping, hot_sums).astype(
                self.r.dtype, copy=False)
            delta = np.abs(a - self.r)
            self.r = a
            self.conv = delta <= tol
            hot = np.empty(0, dtype=np.int64)
        linf = float(delta.max()) if len(delta) else 0.0
        # all three norm partials are one pass over delta — the driver picks
        # (l1Norm/l2Norm/liNorm, `src/_vector.hxx:264-459`)
        self._norms = (float(delta.sum()), float((delta * delta).sum()), linf)

        marks: dict[int, np.ndarray] = {}
        if len(hot):
            # frontier expansion: out-neighbors (new graph) of vertices whose
            # rank moved more than D (`src/pagerankBasic.hxx:196`)
            nbrs = np.unique(csr.out_neighbors(hot))
            owner = (nbrs % csr.num_partitions).astype(np.int64)
            order = np.argsort(owner, kind="stable")
            nbrs, owner = nbrs[order], owner[order]
            parts, first = np.unique(owner, return_index=True)
            bounds = np.append(first, len(nbrs))
            for i, p in enumerate(parts):
                loc = (nbrs[bounds[i]: bounds[i + 1]] // csr.num_partitions).astype(np.int64)
                if p == self.pid:
                    self.vaff[loc] = True
                else:
                    marks[int(p)] = loc
        n_active = int(len(sel)) if sel is not None else csr.n_owned
        return linf, marks, n_active

    def hot_partial_step(self, shard_refs) -> np.ndarray:
        """Phase A of a hot-split superstep: gather this iteration's
        contributions (cached for the phase-B ``step``) and return this
        partition's hot partial-sum vector for the driver to combine."""
        shards = ray.get([shard_refs[p] for p in self.csr.needed_parts])
        self._cvals = self.csr.gather(shards)
        return self.csr.hot_partial(self._cvals)

    def step(self, shard_refs, c0, damping, tol, frontier_d, hot_sums=None,
             fault=None):
        """One with-barrier superstep.  ``shard_refs``: refs of every
        partition's previous-iteration contribution shard; fetches only the
        partitions in the gather plan (``None`` -> reuse the contributions
        cached by ``hot_partial_step``).  Returns (new_shard, stats).
        ``fault``: sleep/crash injection (`main.cxx:137-169` model) — under
        a barrier a sleeping partition stalls EVERY partition's iteration,
        which is exactly the effect the barrier-free mode removes;
        ``crash_at`` terminates the ACTOR (crash-stop) so the driver sees a
        RayActorError and must rebuild — the with-barrier recovery twin of
        ``run_async``'s crashed flag."""
        if fault:
            if not hasattr(self, "_fault_rng"):
                self._fault_rng = np.random.default_rng([self.pid, 987])
            if _fault_draw(fault, self._fault_rng, self._step_count,
                           self.csr.n_owned):
                ray.actor.exit_actor()
        self._step_count += 1
        if shard_refs is None:
            cvals = self._cvals
        else:
            shards = ray.get([shard_refs[p] for p in self.csr.needed_parts])
            cvals = self.csr.gather(shards)
        linf, marks, n_active = self._sweep(cvals, c0, damping, tol, frontier_d, hot_sums)
        stats = {
            "pid": self.pid,
            "linf": linf,
            "l1": self._norms[0],
            "l2sq": self._norms[1],
            "marks": marks,
            "n_active": n_active,
            "n_owned": self.csr.n_owned,
            # post-sweep dead-end mass: the driver folds the P partials into
            # the NEXT iteration's teleport C0 (DEAD mode; zero when the
            # layout has self-loops, so always cheap to report)
            "dead": float(self.r[self._dead_mask].sum()),
        }
        return self.shard(), stats

    # -------------------------------------------------- barrier-free protocol
    def run_async(
        self,
        board,
        c0: float,
        damping: float,
        tol: float,
        frontier_d,
        max_iter: int,
        fault=None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        dead: bool = False,
    ) -> dict:
        """Barrier-free local loop (`src/pagerankBarrierfree.hxx:213-235`).

        Publishes/fetches through the board each sweep; no two partitions are
        ever synchronized.  ``fault``: optional dict — per-vertex
        ``crash_prob`` / ``sleep_prob_v`` (the reference's stochastic model,
        `main.cxx:137-169`, see :func:`_fault_draw`) plus the deterministic
        per-partition ``sleep_prob`` / ``sleep_s`` / ``crash_at`` knobs.  A
        crashed partition stops sweeping (crash-stop) — its last published
        shard stays on the board and survivors converge around it, the
        reference's crashed-thread shape.
        """
        csr = self.csr
        it = 0
        crashed = False
        rng = np.random.default_rng([self.pid, 1234])
        if isinstance(board, (list, tuple)):
            # sharded board: (shards list, coordinator) — see RankBoardShard
            view = _ShardedBoardView(board[0], board[1], self.pid,
                                     csr.needed_parts)
        else:
            view = _SingleBoardView(board, self.pid, csr.needed_parts)
        my_ref = ray.put(self.shard())
        refs, stop, mail = view.exchange(my_ref, False, 0, {})
        while it < max_iter and not stop:
            if fault and _fault_draw(fault, rng, it, csr.n_owned):
                crashed = True
                break
            for arr in mail:
                self.vaff[arr] = True
            # a peer that has not published its first shard yet contributes
            # zero this sweep.  Safe under the barrier-free staleness
            # argument (a too-small partial sum only delays the fixed
            # point); the gap closes at the next board sync.  All present
            # refs are fetched in ONE batched ray.get (per-ref gets pay a
            # round-trip each — measured 3x the sweep time at P=16)
            need = [int(p) for p in csr.needed_parts]
            present = [p for p in need if refs[p] is not None]
            fetched = dict(zip(present, ray.get([refs[p] for p in present])))
            shards = [
                fetched[p] if p in fetched else np.zeros(
                    CsrPartition.owned_count(csr.n_vertices, p, csr.num_partitions)
                )
                for p in need
            ]
            cvals = csr.gather(shards)
            hot_sums = None
            if csr.n_hot:
                # publish own freshest partial, receive the combined sums
                # (stale peers tolerated — barrier-free semantics)
                hot_sums = view.hot_exchange(csr.hot_partial(cvals))
            c0_t = c0
            if dead:
                # nowait teleport: own freshest dead mass out, global sum in
                total = view.dead_exchange(self.dead_mass())
                c0_t = c0 + damping * total / csr.n_vertices
            linf, marks, _ = self._sweep(cvals, c0_t, damping, tol, frontier_d, hot_sums)
            it += 1
            if checkpoint_dir and checkpoint_every and it % checkpoint_every == 0:
                # barrier-less checkpoint: each partition persists its OWN
                # slice on its OWN schedule (atomic replace) — parts in the
                # dir may sit at different local iterations, which is valid
                # barrier-free state to resume from
                self.write_checkpoint(checkpoint_dir)
            if self.frontier_mode:
                # unaffected vertices are pre-marked converged
                # (`src/pagerankBarrierfree.hxx:98-106`)
                all_conv = bool(self.conv[self.vaff].all()) if self.vaff.any() else True
            else:
                all_conv = bool(self.conv.all())
            my_ref = ray.put(self.shard())
            refs, stop, mail = view.exchange(my_ref, all_conv, it, marks)
        return {"pid": self.pid, "iterations": it, "crashed": crashed}

    # -------------------------------------------------- label algorithms
    # (connected components / label propagation reuse the CSR + gather plan;
    # they are run on a SYMMETRIZED layout so in-neighbors == all neighbors)

    def init_labels(self) -> None:
        self.lab = self.csr.owned_vids().astype(np.int64)

    def label_shard(self) -> np.ndarray:
        return self.lab

    def _label_cvals(self, shard_refs) -> np.ndarray:
        """Gathered neighbor labels (``None`` -> reuse the ones cached by
        ``label_hot_partial_step`` — the hot-split phase-A/B contract)."""
        if shard_refs is None:
            return self._lab_cvals
        shards = ray.get([shard_refs[p] for p in self.csr.needed_parts])
        return np.concatenate(
            [sh[need] for sh, need in zip(shards, self.csr.needs)]
        ) if shards else np.empty(0, np.int64)

    def label_hot_partial_step(self, shard_refs, kind: str):
        """Phase A of a hot-split label sweep: gather this iteration's
        neighbor labels (cached for phase B) and return this partition's
        partial for every GLOBAL hot vertex — ``min`` of shard labels (CC)
        or (slot*(n+1)+label, count) histograms (LP mode) — the same
        partial/combine structure as PageRank's ``hot_partial_step``."""
        csr = self.csr
        self._lab_cvals = self._label_cvals(shard_refs)
        hl = self._lab_cvals[csr.hot_src_pos]
        if kind == "min":
            part = np.full(csr.n_hot, csr.n_vertices, dtype=np.int64)
            np.minimum.at(part, csr.hot_slot, hl)
            return part
        key = csr.hot_slot.astype(np.int64) * np.int64(csr.n_vertices + 1) + hl
        uniq, cnt = np.unique(key, return_counts=True)
        return uniq, cnt.astype(np.int64)

    def cc_step(self, shard_refs, hot_vals: np.ndarray | None = None):
        """Min-label propagation sweep: lab[v] = min(lab[v], min over
        neighbors) (SURVEY §2.12).  ``hot_vals``: combined min per global
        hot vertex (hot-split layouts; a hot vertex's in-edges live only in
        the src-sharded store, so its owner applies the combined value).
        Returns (new_shard, n_changed)."""
        cvals = self._label_cvals(shard_refs)
        new = self.lab.copy()
        np.minimum.at(new, self.csr.in_dst_local, cvals[self.csr.in_src_pos])
        if hot_vals is not None and len(self.csr.own_hot_slots):
            sl = self.csr.own_hot_slots
            new[sl] = np.minimum(new[sl], hot_vals[self.csr.own_hot_idx])
        changed = int((new != self.lab).sum())
        self.lab = new
        return self.lab, changed

    def lp_step(self, shard_refs, hot_vals: np.ndarray | None = None):
        """Synchronous label propagation sweep: most frequent neighbor label,
        ties -> smallest label (deterministic; self counts once via the
        self-loop).  ``hot_vals``: driver-combined mode label per global hot
        vertex (hot-split layouts).  Returns (new_shard, n_changed)."""
        cvals = self._label_cvals(shard_refs)
        nl = cvals[self.csr.in_src_pos]
        # int64 BEFORE the multiply: in_dst_local is int32 and numpy 1.x
        # value-based casting would wrap the product for n_vertices >~ 131k
        d = self.csr.in_dst_local.astype(np.int64)
        n = self.csr.n_vertices
        key = d * np.int64(n + 1) + nl
        uniq, cnt = np.unique(key, return_counts=True)
        kv = uniq // (n + 1)
        kl = uniq % (n + 1)
        order = np.lexsort((kl, -cnt, kv))  # (v asc, count desc, label asc)
        kv_o = kv[order]
        first = np.concatenate([[True], kv_o[1:] != kv_o[:-1]])
        new = self.lab.copy()
        new[kv_o[first]] = kl[order][first]
        if hot_vals is not None and len(self.csr.own_hot_slots):
            # hot vertices have no cold in-edges: their mode comes entirely
            # from the driver-combined histograms
            new[self.csr.own_hot_slots] = hot_vals[self.csr.own_hot_idx]
        changed = int((new != self.lab).sum())
        self.lab = new
        return self.lab, changed

    def write_label_checkpoint(self, path: str) -> str:
        """Owned (vid, label) -> one parquet file per partition — the
        Dataset-native consumption path for CC/LP (the label twin of
        ``write_checkpoint``: at |V| = 10^9 the dense label vector is an
        8 GB driver array, so ``LabelEngine`` offers ``collect=False`` +
        this slice-per-owner layout instead)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        t = pa.table(
            {
                "vid": pa.array(self.csr.owned_vids().astype(np.int64)),
                "label": pa.array(self.lab),
            }
        )
        f = os.path.join(path, f"part-{self.pid}.parquet")
        tmp = f + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, f)
        return f

    # -------------------------------------------------- checkpoint
    def write_checkpoint(self, path: str) -> str:
        """Owned (vid, rank, affected) -> one parquet file per partition —
        the resumable unit (SURVEY §4 checkpoint row)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        t = pa.table(
            {
                "vid": pa.array(self.csr.owned_vids()),
                "rank": pa.array(self.r),
                "affected": pa.array(self.vaff),
            }
        )
        f = os.path.join(path, f"part-{self.pid}.parquet")
        tmp = f + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, f)
        return f

    def load_checkpoint(self, path: str) -> None:
        import os

        import pyarrow.parquet as pq

        f = os.path.join(path, f"part-{self.pid}.parquet")
        if not os.path.isfile(f):
            # barrier-less checkpoints: a partition that crashed before its
            # first write has no slice — resuming it from the initial ranks
            # is valid barrier-free state (stale = merely behind)
            return
        t = pq.read_table(f)
        vid = t["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        slot = vid // self.csr.num_partitions
        self.r[slot] = t["rank"].to_numpy(zero_copy_only=False)
        self.vaff[slot] = t["affected"].to_numpy(zero_copy_only=False)
