"""CLI driver (`cli.py` — the reference binary's runExperiment analogue,
`main.cxx:181-229`): subprocess smoke with output-contract assertions."""

import json
import subprocess
import sys

import numpy as np


def _write_mtx(path, n=300, m=2200, seed=3):
    rng = np.random.default_rng(seed)
    lines = [f"{int(s)+1} {int(d)+1}"
             for s, d in zip(rng.integers(0, n, m), rng.integers(0, n, m))]
    path.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        f"{n} {n} {m}\n" + "\n".join(lines) + "\n")
    return n


def test_cli_run_on_mtx(tmp_path):
    p = tmp_path / "g.mtx"
    n = _write_mtx(p)
    out = subprocess.run(
        [sys.executable, "-m", "pagerank_barrierfree_openmp_dynamic_ray",
         "--num-cpus", "4", "--work", str(tmp_path / "w"),
         "run", str(p), "--partitions", "3"],
        capture_output=True, text=True, timeout=300, check=True,
    ).stdout
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["order"] == n and rec["technique"] == "pagerankBarrier"
    assert rec["iterations"] > 0 and len(rec["top10"]) == 10
    ranks = [r for _, r in rec["top10"]]
    assert ranks == sorted(ranks, reverse=True)


def test_cli_sweep_logs_eight_techniques(tmp_path):
    p = tmp_path / "g.mtx"
    _write_mtx(p)
    out = subprocess.run(
        [sys.executable, "-m", "pagerank_barrierfree_openmp_dynamic_ray",
         "--num-cpus", "4", "--work", str(tmp_path / "w"),
         "sweep", str(p), "--batch-fractions", "1e-3", "--repeat", "1",
         "--partitions", "3", "--tol", "1e-8"],
        capture_output=True, text=True, timeout=600, check=True,
    ).stdout
    recs = [json.loads(l) for l in out.strip().splitlines()
            if l.startswith("{")]
    # six reference entry points (main.cxx:209-225) + the traversal
    # variant in both protocols (benched by README.md:19-21)
    assert len(recs) == 8
    # every technique converged to the per-batch golden run s0
    assert all(r["linf_err_vs_s0"] < 1e-5 for r in recs)


def test_cli_threads_pool_sweep(tmp_path):
    """runThreads analogue: both protocols at each pool size with edges/s
    and a scaling-efficiency summary row."""
    p = tmp_path / "g.mtx"
    _write_mtx(p)
    out = subprocess.run(
        [sys.executable, "-m", "pagerank_barrierfree_openmp_dynamic_ray",
         "--num-cpus", "4", "--work", str(tmp_path / "w"),
         "threads", str(p), "--pool-sizes", "2,3", "--repeat", "1",
         "--tol", "1e-8"],
        capture_output=True, text=True, timeout=600, check=True,
    ).stdout
    recs = [json.loads(l) for l in out.strip().splitlines()
            if l.startswith("{")]
    summary = recs[-1]
    assert summary["metric"] == "pool_size_sweep"
    rows = summary["rows"]
    assert {(r["pool_size"], r["mode"]) for r in rows} == {
        (2, "barrier"), (2, "barrierfree"), (3, "barrier"), (3, "barrierfree")}
    assert all(r["edges_per_s"] > 0 for r in rows)
    assert all("scaling_eff_vs_smallest" in r for r in rows)
