"""Command-line experiment driver — the reference binary's entry points
re-expressed (`main.cxx:181-229` ``runExperiment`` / `main.sh:15-26` env
knobs), so a user of the reference can point this repo at the same ``.mtx``
inputs and run the same sweeps:

  python -m pagerank_barrierfree_openmp_dynamic_ray run GRAPH.mtx \
      [--mode barrier|barrierfree] [--dead] [--dtype float32] \
      [--partitions P] [--tol T] [--damping D] [--max-iter N]

  python -m pagerank_barrierfree_openmp_dynamic_ray sweep GRAPH.mtx \
      [--batch-fractions 1e-4,1e-3] [--repeat 5] [--partitions P]

  python -m pagerank_barrierfree_openmp_dynamic_ray threads GRAPH.mtx \
      [--pool-sizes 2,4,8] [--repeat 3]

``run`` builds the layout (cached per input + params under --work) and runs
one technique, printing a reference-style result line
(``{time_ms} ms, {iters} iters ... technique``) plus a JSON line.
``sweep`` is ``runBatches``'s inner loop: per batch fraction × repetition,
generate a uniform deletion+insertion batch, apply it incrementally, and run
all six techniques against a full recompute (``s0``), logging the L∞ error
of each — the reference's own verification pattern (`main.cxx:191-207`).
The structured JSON output replaces the reference's ``process.js`` log→CSV
step (SURVEY §2.1).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time


def _layout_for(path: str, partitions: int, work: str, add_loops: bool):
    """Build (or reuse) the persistent layout for an input graph file."""
    import ray.data as rd

    from .sources.mtx import read_mtx
    from .stages.graph_build import build_graph

    key = hashlib.md5(
        f"{os.path.abspath(path)}:{os.path.getmtime(path)}:{partitions}:"
        f"{add_loops}".encode()
    ).hexdigest()[:16]
    out = os.path.join(work, f"cli_{key}")
    if path.endswith(".mtx"):
        edges, n = read_mtx(path)
    elif path.endswith(".parquet") or os.path.isdir(path):
        edges, n = rd.read_parquet(path, columns=["src", "dst"]), None
    else:
        raise SystemExit(f"unsupported input {path!r} (.mtx or parquet)")
    return build_graph(edges, out, partitions, n_vertices=n,
                       add_loops=add_loops, overwrite=False)


def _result_line(name: str, res, err: float | None = None) -> str:
    """The reference's log line shape (`main.cxx:197-206`)."""
    e = f" err_vs_ref {err:.2e}" if err is not None else ""
    return (f"{res.wall_s * 1e3:09.1f} ms, {res.iterations:03d} iters"
            f"{e}  [{name}]")


def cmd_run(args) -> None:
    import ray

    from .pipelines.pagerank import PageRankEngine

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    lay = _layout_for(args.graph, args.partitions, args.work,
                      add_loops=not args.dead)
    eng = PageRankEngine(lay, num_cpus_per_actor=args.num_cpus / (lay.num_partitions + 1))
    try:
        res = eng.run(mode=args.mode, tol=args.tol, damping=args.damping,
                      max_iter=args.max_iter, dead=args.dead,
                      rank_dtype=args.dtype)
    finally:
        eng.shutdown()
    name = f"pagerank{args.mode.capitalize()}" + ("Dead" if args.dead else "")
    print(_result_line(name, res))
    print(json.dumps({
        "graph": args.graph, "order": lay.n_vertices, "size": lay.n_edges,
        "technique": name, "mode": args.mode, "dead": args.dead,
        "dtype": args.dtype, "partitions": lay.num_partitions,
        "iterations": res.iterations, "wall_s": round(res.wall_s, 4),
        "residual": None if res.residual != res.residual else res.residual,
        "top10": res.top_k(10),
    }))
    ray.shutdown()


def cmd_sweep(args) -> None:
    import numpy as np
    import ray

    from .pipelines.pagerank import Frontier, PageRankEngine
    from .pipelines.updates import (
        apply_batch_to_layout,
        generate_batch_from_layout,
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    lay = _layout_for(args.graph, args.partitions, args.work, add_loops=True)
    eng0 = PageRankEngine(lay, num_cpus_per_actor=args.num_cpus / (lay.num_partitions + 1))
    warm = eng0.run(mode="barrier", tol=args.tol).ranks
    eng0.shutdown()

    fracs = [float(f) for f in args.batch_fractions.split(",")]
    for frac in fracs:
        bsz = max(1, int(round(frac * lay.n_edges)))
        for rep in range(args.repeat):
            ds_, dd_, is_, id_ = generate_batch_from_layout(
                lay, bsz, seed=args.seed + rep
            )
            upd = apply_batch_to_layout(
                lay, os.path.join(args.work, "cli_sweep_upd"),
                ds_, dd_, is_, id_,
            )
            eng = PageRankEngine(
                upd, num_cpus_per_actor=args.num_cpus / (upd.num_partitions + 1)
            )
            try:
                # the reference's per-batch golden run s0 (`main.cxx:191`)
                # at a TIGHTER tolerance than the technique runs — the
                # reference computes its golden at 1e-100, i.e. the machine
                # fixpoint; 1e-13 is float64's practical L-inf floor here
                s0 = eng.run(mode="barrier", tol=args.ref_tol).ranks
                fr = Frontier(old_layout=lay, del_src=ds_, ins_src=is_)
                from .pipelines.traversal import affected_traversal

                aff = affected_traversal(lay, upd, ds_, is_)
                tr = Frontier(old_layout=lay, del_src=ds_, ins_src=is_,
                              affected=aff)
                techniques = {
                    "pagerankBasic static": dict(mode="barrier"),
                    "pagerankBasic naive-dynamic": dict(mode="barrier", q=warm),
                    "pagerankBasic dynamic-traversal": dict(
                        mode="barrier", q=warm, frontier=tr),
                    "pagerankBasic dynamic-frontier": dict(
                        mode="barrier", q=warm, frontier=fr),
                    "pagerankBarrierfree static": dict(mode="barrierfree"),
                    "pagerankBarrierfree naive-dynamic": dict(
                        mode="barrierfree", q=warm),
                    "pagerankBarrierfree dynamic-traversal": dict(
                        mode="barrierfree", q=warm, frontier=tr),
                    "pagerankBarrierfree dynamic-frontier": dict(
                        mode="barrierfree", q=warm, frontier=fr),
                }
                for name, kw in techniques.items():
                    res = eng.run(tol=args.tol, **kw)
                    err = float(np.abs(res.ranks - s0).max())
                    print(_result_line(name, res, err))
                    print(json.dumps({
                        "batch_fraction": frac, "batch_edges": bsz,
                        "repetition": rep, "technique": name,
                        "iterations": res.iterations,
                        "wall_s": round(res.wall_s, 4),
                        "linf_err_vs_s0": err,
                    }))
            finally:
                eng.shutdown()
    ray.shutdown()


def cmd_threads(args) -> None:
    """``runThreads`` analogue (`main.cxx:127-134`, swept by `main.sh:20`):
    the reference re-runs each technique at several OpenMP thread counts; the
    engine's parallel unit is the partition-actor pool, so this sweeps
    POOL SIZES over the same input and logs edges/s per level plus the
    scaling efficiency vs the smallest pool.  Note: Ray's ``num_cpus`` is
    admission control, not a hard CPU cage — for host-CPU scaling evidence
    use ``bench.py --scaling`` (taskset protocol, see BASELINE.md)."""
    import numpy as np
    import ray

    from .pipelines.pagerank import PageRankEngine

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    sizes = sorted(int(s) for s in args.pool_sizes.split(","))
    rows = []
    for P in sizes:
        lay = _layout_for(args.graph, P, args.work, add_loops=True)
        eng = PageRankEngine(lay, num_cpus_per_actor=args.num_cpus / (P + 1))
        try:
            for mode in ("barrier", "barrierfree"):
                # median-of-repeat like the reference's repeated runs.
                # edges/s is computed PER repeat (barrier-free iteration
                # counts vary run to run, so pairing one repeat's iters
                # with another's wall would skew the throughput) and the
                # median of those consistent ratios is reported.
                walls, iters, epss = [], [], []
                for _ in range(args.repeat):
                    res = eng.run(mode=mode, tol=args.tol)
                    walls.append(res.wall_s)
                    iters.append(res.iterations)
                    epss.append(res.iterations * lay.n_edges / res.wall_s
                                if res.wall_s else 0.0)
                print(_result_line(f"{mode} pool={P}", res))
                rows.append({
                    "pool_size": P, "mode": mode,
                    "iterations": float(np.median(iters)),
                    "wall_s": round(float(np.median(walls)), 4),
                    "edges_per_s": round(float(np.median(epss)), 1),
                })
                print(json.dumps(rows[-1]))
        finally:
            eng.shutdown()
    base = {r["mode"]: r for r in rows if r["pool_size"] == sizes[0]}
    for r in rows:
        b = base[r["mode"]]
        ratio = sizes[0] and r["pool_size"] / sizes[0]
        speed = r["edges_per_s"] / b["edges_per_s"] if b["edges_per_s"] else 0
        r["scaling_eff_vs_smallest"] = round(speed / ratio, 3) if ratio else None
    print(json.dumps({"metric": "pool_size_sweep", "graph": args.graph,
                      "num_cpus": args.num_cpus, "rows": rows}))
    ray.shutdown()


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        prog="pagerank_barrierfree_openmp_dynamic_ray",
        description="Ray-Data link-graph engine CLI (reference main.cxx analogue)",
    )
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("MAX_THREADS", "8")))
    ap.add_argument("--work", default="/tmp/graft_layouts")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="one technique on one graph")
    r.add_argument("graph")
    r.add_argument("--mode", choices=["barrier", "barrierfree"],
                   default="barrier")
    r.add_argument("--dead", action="store_true",
                   help="teleport dead-end handling (no self-loop trick)")
    r.add_argument("--dtype", choices=["float64", "float32"],
                   default="float64")
    r.add_argument("--partitions", type=int, default=8)
    r.add_argument("--tol", type=float, default=1e-10)
    r.add_argument("--damping", type=float, default=0.85)
    r.add_argument("--max-iter", type=int, default=500)
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("sweep", help="runBatches: batch sweep, 6 techniques vs s0")
    s.add_argument("graph")
    s.add_argument("--batch-fractions", default="1e-4,1e-3")
    s.add_argument("--repeat", type=int,
                   default=int(os.environ.get("REPEAT_BATCH", "5")))
    s.add_argument("--partitions", type=int, default=8)
    s.add_argument("--tol", type=float, default=1e-10)
    s.add_argument("--ref-tol", type=float, default=1e-13,
                   help="tolerance of the golden s0 run the L-inf column "
                   "compares against (reference: 1e-100, main.cxx:24)")
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=cmd_sweep)

    t = sub.add_parser(
        "threads", help="runThreads: re-run both protocols at several "
        "actor-pool sizes, log edges/s + scaling efficiency")
    t.add_argument("graph")
    t.add_argument("--pool-sizes", default="2,4,8")
    t.add_argument("--repeat", type=int, default=3)
    t.add_argument("--tol", type=float, default=1e-10)
    t.set_defaults(fn=cmd_threads)

    args = ap.parse_args(argv)
    os.makedirs(args.work, exist_ok=True)
    args.fn(args)


if __name__ == "__main__":
    main()
