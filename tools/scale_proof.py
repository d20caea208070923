"""One-shot at-scale proof run (VERDICT r03 item 2; reference corpus reaches
~2e9 edges, `main.sh:74-87`): synthesize a >=1e9-edge symmetric web-ish graph
deterministically, build the partitioned layout, run static PageRank and
connected components, and print a JSON line with wall times, edges/s, peak
RSS, and object-store spill — the table BASELINE.md records.

    python tools/scale_proof.py --pairs 500000000 --vertices 50000000 \
        --partitions 32 [--out /tmp/scale_proof]

The graph: M canonical pairs (a, b), a uniform over V, b drawn with a
u^2 inverse-CDF so low ids are celebrity vertices (max degree ~1e5 at the
default scale — exercises the hot-split layout path), mirrored to 2M
directed edges before the build's dedup+self-loop pass.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import threading
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _peak_rss_sampler(stop: threading.Event, out: dict) -> None:
    """Track peak whole-machine used memory + summed ray-process RSS."""
    import psutil

    peak_used = 0
    peak_ray = 0
    while not stop.is_set():
        peak_used = max(peak_used, psutil.virtual_memory().used)
        ray_rss = 0
        for p in psutil.process_iter(["name", "memory_info"]):
            try:
                nm = p.info["name"] or ""
                if "ray" in nm or "python" in nm:
                    ray_rss += p.info["memory_info"].rss
            except Exception:
                continue
        peak_ray = max(peak_ray, ray_rss)
        out["peak_used_gb"] = round(peak_used / 2**30, 2)
        out["peak_ray_rss_gb"] = round(peak_ray / 2**30, 2)
        stop.wait(2.0)


def _spilled_gb() -> float:
    """Object-store spill (GB) parsed from the raylet's spill counters."""
    total = 0
    for f in glob.glob("/tmp/ray/session_latest/logs/raylet.out"):
        try:
            for line in open(f, errors="ignore"):
                if "Spilled " in line:
                    # "Spilled 1234 MiB, 56 objects, ..."
                    try:
                        mb = float(line.split("Spilled ", 1)[1].split(" MiB")[0])
                        total = max(total, mb)
                    except Exception:
                        continue
        except OSError:
            continue
    return round(total / 1024, 2)


def _ray_init():
    """Fresh local Ray session sized for the proof.

    - 55 GiB object store in /dev/shm (RAM-backed): keeps the dedup
      shuffle's map outputs in memory instead of spilling to disk.
    - ``local_fs_capacity_threshold=0.98``: this sandbox's root fs keeps
      160 GB of its 252 GB ROOT-RESERVED (statvfs f_bfree=239G but
      f_bavail=79G), and Ray computes utilization as
      (total - available)/total — i.e. it reads ~69% "used" on an
      empty disk and kills the job (OutOfDiskError) after only ~66 GB
      of real writes.  As root we can use the reserved blocks, so 0.98
      restores ~74 GB of genuine headroom while still guarding against
      actually filling the device.
    """
    import ray

    ray.init(address="local", include_dashboard=False,
             object_store_memory=55 * 2**30,
             _system_config={"local_fs_capacity_threshold": 0.98})


def _ray_recycle(result: dict, stage: str) -> None:
    """Tear the session down between stages so the previous stage's spill
    files are deleted before the next stage starts writing — peak DISK is
    what killed the first attempt at this scale, and spill is per-session
    state.  Records the finished session's spill GB, removes its leftover
    session dir, and starts a fresh session."""
    import ray

    result.setdefault("spilled_gb_by_stage", {})[stage] = _spilled_gb()
    ray.shutdown()
    for d in glob.glob("/tmp/ray/session_2*"):
        shutil.rmtree(d, ignore_errors=True)
    _ray_init()


def synth_edges(n_pairs: int, n_vertices: int, seed: int, num_blocks: int):
    """Deterministic mirrored edge Dataset: 2*n_pairs rows of (src, dst)."""
    import ray.data as rd

    per = -(-n_pairs // num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        bids = batch["id"].to_numpy()
        outs = []
        for bid in bids:
            lo = int(bid) * per
            m = min(per, n_pairs - lo)
            if m <= 0:
                continue
            rng = np.random.default_rng(seed + int(bid))
            a = rng.integers(0, n_vertices, m, dtype=np.int64)
            # inverse-CDF u^2: celebrity-skewed endpoint
            b = (rng.random(m) ** 2 * n_vertices).astype(np.int64)
            outs.append(pa.table({
                "src": pa.array(np.concatenate([a, b]).astype(np.uint64)),
                "dst": pa.array(np.concatenate([b, a]).astype(np.uint64)),
            }))
        return (pa.concat_tables(outs) if outs
                else pa.table({"src": pa.array([], pa.uint64()),
                               "dst": pa.array([], pa.uint64())}))

    return rd.range(num_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=1)


def synth_ring_edges(n_vertices: int, k: int, segment: int, num_blocks: int):
    """Deterministic LOCALIZED graph: vids partitioned into rings of
    ``segment`` vertices; each vertex links to its next ``k`` neighbors
    within its ring (mirrored -> 2k degree).  No edge crosses a segment, so
    a batch's influence is confined — the localized regime where the
    frontier rule's affected set stays small (the reference's Fig.-2
    crossover graph, at proof scale)."""
    import ray.data as rd

    per = -(-n_vertices // num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        outs = []
        for bid in batch["id"].to_numpy():
            lo = int(bid) * per
            m = min(per, n_vertices - lo)
            if m <= 0:
                continue
            v = np.arange(lo, lo + m, dtype=np.uint64)
            seg = v // np.uint64(segment)
            base = seg * np.uint64(segment)
            pos = v - base
            seg_len = np.minimum((seg + np.uint64(1)) * np.uint64(segment),
                                 np.uint64(n_vertices)) - base
            srcs, dsts = [], []
            for off in range(1, k + 1):
                dst = base + (pos + np.uint64(off)) % seg_len
                keep = dst != v  # segments shorter than off+1
                srcs.append(v[keep])
                dsts.append(dst[keep])
            s = np.concatenate(srcs)
            d = np.concatenate(dsts)
            outs.append(pa.table({
                "src": pa.array(np.concatenate([s, d])),
                "dst": pa.array(np.concatenate([d, s])),
            }))
        return (pa.concat_tables(outs) if outs
                else pa.table({"src": pa.array([], pa.uint64()),
                               "dst": pa.array([], pa.uint64())}))

    return rd.range(num_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=500_000_000)
    ap.add_argument("--vertices", type=int, default=50_000_000)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--out", default="/tmp/scale_proof")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--hot-threshold", type=int, default=65_536)
    ap.add_argument("--keep", action="store_true",
                    help="keep the layout dir (default: delete at exit)")
    ap.add_argument("--resume", action="store_true",
                    help="reuse a complete layout at --out if present")
    ap.add_argument("--dynamic-batch", type=int, default=0,
                    help="after static PR: generate this many edge "
                    "deletions+insertions, apply them INCREMENTALLY, and "
                    "run warm-started naive-dynamic + dynamic-frontier PR "
                    "on the updated layout (the reference's headline "
                    "experiment, main.sh batch grid)")
    ap.add_argument("--dynamic-local-span", type=int, default=0,
                    help="with --dynamic-batch: draw the batch as "
                    "INSERTIONS ONLY among vids < span (a localized update "
                    "— the regime where the frontier rule's affected set "
                    "stays small; 0 = uniform del+ins over the layout)")
    ap.add_argument("--graph", choices=["skew", "ring"], default="skew",
                    help="edge generator: 'skew' = u^2 celebrity-skewed "
                    "random pairs (expander); 'ring' = segmented k-neighbor "
                    "rings (localized; --pairs is ignored, |E| = "
                    "2k * vertices)")
    ap.add_argument("--ring-k", type=int, default=10)
    ap.add_argument("--ring-segment", type=int, default=256)
    ap.add_argument("--init-wave", type=int, default=8,
                    help="concurrent first-time CSR builds per engine init "
                    "(8 fit 1.05B edges in 125 GiB; the 2B run needs 4 — "
                    "the last wave's lexsort transients stack on top of "
                    "every already-pinned partition)")
    ap.add_argument("--dedup", choices=["shuffle", "local"], default="local",
                    help="edge-dedup plan: 'shuffle' = global hash(src,dst)%%P "
                    "exchange (the r4 proofs' path; its sort spill exceeds "
                    "this node's disk past ~1.5e9 edges); 'local' = "
                    "partition-local lexsort rewrite fused with the degree "
                    "pass — the whole build becomes shuffle-free (default)")
    ap.add_argument("--skip-cc", action="store_true",
                    help="skip the connected-components stage (bounds wall "
                    "time when the PR proof is the object)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        _ray_init()

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.components import (
        LabelEngine,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
        PageRankEngine,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build import (
        build_graph,
    )

    rss: dict = {}
    stop = threading.Event()
    t = threading.Thread(target=_peak_rss_sampler, args=(stop, rss),
                         daemon=True)
    t.start()
    result: dict = {"pairs": args.pairs, "n_vertices": args.vertices,
                    "partitions": args.partitions}

    if os.path.isdir(args.out) and not args.resume:
        shutil.rmtree(args.out)

    try:
        # ---- build (generation streams straight into the build's dedup) ----
        if args.graph == "ring":
            n_blocks = max(32, args.vertices * args.ring_k // 4_000_000)
            edges = synth_ring_edges(args.vertices, args.ring_k,
                                     args.ring_segment, n_blocks)
            result["graph"] = {"kind": "ring", "k": args.ring_k,
                               "segment": args.ring_segment}
        else:
            n_blocks = max(32, args.pairs // 4_000_000)
            edges = synth_edges(args.pairs, args.vertices, args.seed,
                                n_blocks)
        t0 = time.perf_counter()
        lay = build_graph(edges, args.out, args.partitions,
                          n_vertices=args.vertices,
                          hot_in_threshold=args.hot_threshold,
                          symmetric=True,  # mirrored by construction
                          overwrite=not args.resume,
                          dedup_mode={"shuffle": "shuffle",
                                      "local": "partition_local"}[args.dedup])
        dt = time.perf_counter() - t0
        # build_graph marks a validated resume explicitly — no wall-clock
        # guessing (ADVICE r04: a fast fresh build or an in-wave throttled
        # validation would both be misclassified by a time heuristic)
        resumed = bool(getattr(lay, "resumed_from_disk", False))
        result["build"] = {
            # a resumed run only VALIDATES the existing layout: wall_s /
            # edges_per_s are nulled so no consumer aggregates a fabricated
            # throughput (see BASELINE.md for the real build measurement)
            "wall_s": None if resumed else round(dt, 1),
            "resumed": resumed,
            "dedup": args.dedup,
            "n_edges": lay.n_edges,
            "n_hot": lay.n_hot,
            "edges_per_s": None if resumed else int(lay.n_edges / dt),
            "layout_gb": round(sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(args.out) for f in fs) / 2**30, 2),
            "disk_free_gb": round(shutil.disk_usage("/tmp").free / 2**30, 1),
        }
        print(json.dumps({"stage": "build", **result["build"]}), flush=True)
        _ray_recycle(result, "build")

        # ---- static PageRank ----
        t0 = time.perf_counter()
        # init_wave=8: cap concurrent first-time CSR builds — un-staggered,
        # 32 simultaneous lexsort+gather-plan builds (~3 GB transient each)
        # OOM-killed an actor at this scale on the first attempt
        eng = PageRankEngine(lay, num_cpus_per_actor=0.9,
                             init_wave=args.init_wave)
        init_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = eng.run(mode="barrier")
        dt = time.perf_counter() - t0
        result["pr_static"] = {
            "engine_init_s": round(init_s, 1), "wall_s": round(dt, 1),
            "iterations": res.iterations,
            "sweep_edges_per_s": int(lay.n_edges * res.iterations / dt),
            "rank_sum": float(res.ranks.sum()),
            "disk_free_gb": round(shutil.disk_usage("/tmp").free / 2**30, 1),
        }
        print(json.dumps({"stage": "pr_static", **result["pr_static"]}),
              flush=True)
        warm = res.ranks if args.dynamic_batch else None
        eng.shutdown()

        # ---- dynamic step: incremental batch apply + warm-started PR ----
        if args.dynamic_batch:
            from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
                Frontier,
            )
            from pagerank_barrierfree_openmp_dynamic_ray.pipelines.updates import (
                apply_batch_to_layout,
                generate_batch_from_layout,
            )

            t0 = time.perf_counter()
            if args.dynamic_local_span:
                g = np.random.default_rng(7)
                is_ = g.integers(0, args.dynamic_local_span,
                                 args.dynamic_batch).astype(np.uint64)
                id_ = g.integers(0, args.dynamic_local_span,
                                 args.dynamic_batch).astype(np.uint64)
                ds_ = dd_ = np.empty(0, np.uint64)
            else:
                ds_, dd_, is_, id_ = generate_batch_from_layout(
                    lay, args.dynamic_batch, seed=7)
            gen_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            new = apply_batch_to_layout(lay, args.out + "_g2",
                                        ds_, dd_, is_, id_)
            apply_s = time.perf_counter() - t0
            _ray_recycle(result, "batch_apply")
            t0 = time.perf_counter()
            eng2 = PageRankEngine(new, num_cpus_per_actor=0.9,
                                  init_wave=args.init_wave)
            init2_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            rn = eng2.run(mode="barrier", q=warm)
            naive_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            rf = eng2.run(mode="barrier", q=warm,
                          frontier=Frontier(old_layout=lay, del_src=ds_,
                                            ins_src=is_))
            frontier_s = time.perf_counter() - t0
            linf = float(np.abs(rn.ranks - rf.ranks).max())
            result["dynamic"] = {
                "batch_edges": int(len(ds_) + len(is_)),
                "gen_s": round(gen_s, 1),
                "incremental_apply_s": round(apply_s, 1),
                "n_edges_new": new.n_edges,
                "engine_init_s": round(init2_s, 1),
                "local_span": args.dynamic_local_span or None,
                "pr_naive": {"wall_s": round(naive_s, 1),
                             "iters": rn.iterations,
                             "swept_vertices": rn.stats["swept_vertices"]},
                "pr_frontier": {"wall_s": round(frontier_s, 1),
                                "iters": rf.iterations,
                                "swept_vertices": rf.stats["swept_vertices"]},
                "frontier_vs_naive_linf": linf,
                "disk_free_gb": round(
                    shutil.disk_usage("/tmp").free / 2**30, 1),
            }
            print(json.dumps({"stage": "dynamic", **result["dynamic"]}),
                  flush=True)
            eng2.shutdown()
            shutil.rmtree(args.out + "_g2", ignore_errors=True)
            _ray_recycle(result, "dynamic_pr")

        # ---- connected components (layout is symmetric by construction) ----
        if args.skip_cc:
            result["cc"] = {"skipped": True}
            print(json.dumps({"stage": "cc", "skipped": True}), flush=True)
        else:
            t0 = time.perf_counter()
            le = LabelEngine(lay, num_cpus_per_actor=0.9,
                             init_wave=args.init_wave)
            le_init_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            cc = le.connected_components(collect=False)
            dt = time.perf_counter() - t0
            result["cc"] = {
                "engine_init_s": round(le_init_s, 1), "wall_s": round(dt, 1),
                "iterations": cc.iterations,
                "sweep_edges_per_s": int(lay.n_edges * cc.iterations / dt),
            }
            print(json.dumps({"stage": "cc", **result["cc"]}), flush=True)
            le.shutdown()
    finally:
        stop.set()
        t.join(timeout=5)
        result["peak_rss"] = rss
        result.setdefault("spilled_gb_by_stage", {})["pr_cc"] = _spilled_gb()
        result["spilled_gb"] = round(
            sum(result["spilled_gb_by_stage"].values()), 2)
        if not args.keep:
            shutil.rmtree(args.out, ignore_errors=True)
        print(json.dumps(result), flush=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
