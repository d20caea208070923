"""Dynamic PageRank: batch apply, naive-dynamic, dynamic-frontier (both
protocols), checkpoint/resume, actor-crash recovery.

Verification model = the reference's own: dynamic ranks must match a full
recompute on the updated graph (``a* vs s0``, ``main.cxx:207-225``)."""

import os

import numpy as np
import pyarrow as pa
import pytest

import pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build as gb
from pagerank_barrierfree_openmp_dynamic_ray.functions.oracle import pagerank_power
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
    Frontier,
    PageRankEngine,
)
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.updates import (
    apply_batch_to_layout,
    generate_batch,
    layout_edge_arrays,
)
from pagerank_barrierfree_openmp_dynamic_ray.state.checkpoint import (
    latest_checkpoint,
    read_lineage,
)


@pytest.fixture(scope="module")
def dyn(ray_session, tmp_path_factory):
    """Original graph, an update batch, and the updated layout."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    n, m = 300, 2400
    src = rng.integers(0, n, m).astype(np.uint64)
    dst = rng.integers(0, n, m).astype(np.uint64)
    root = tmp_path_factory.mktemp("dyn")
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    old = gb.build_graph(ds, str(root / "old"), num_partitions=3, n_vertices=n)
    s0, d0 = layout_edge_arrays(old)
    dels_s, dels_d, ins_s, ins_d = generate_batch(s0, d0, n, batch_size=24, seed=5)
    new = apply_batch_to_layout(old, str(root / "new"), dels_s, dels_d, ins_s, ins_d)
    return old, new, (dels_s, dels_d, ins_s, ins_d), root


def test_apply_batch_semantics(dyn):
    old, new, (ds_, dd_, is_, id_), _ = dyn
    s1, d1 = layout_edge_arrays(new)
    pairs = set(zip(s1.tolist(), d1.tolist()))
    n = old.n_vertices
    # all self-loops present (re-self-loop after deletions)
    for v in range(n):
        assert (v, v) in pairs
    # insertions present
    for u, v in zip(is_.tolist(), id_.tolist()):
        assert (u, v) in pairs
    # deletions absent unless re-inserted or a self-loop
    inserted = set(zip(is_.tolist(), id_.tolist()))
    for u, v in zip(ds_.tolist(), dd_.tolist()):
        if (u, v) in inserted or u == v:
            continue
        assert (u, v) not in pairs
    assert len(pairs) == new.n_edges


@pytest.fixture(scope="module")
def oracle_new(dyn):
    _, new, _, _ = dyn
    s1, d1 = layout_edge_arrays(new)
    ranks, _ = pagerank_power(s1, d1, new.n_vertices)
    return ranks


@pytest.fixture(scope="module")
def warm(dyn):
    old, _, _, _ = dyn
    eng = PageRankEngine(old, num_cpus_per_actor=0.25)
    r0 = eng.run(mode="barrier").ranks
    eng.shutdown()
    return r0


@pytest.fixture(scope="module")
def new_engine(dyn):
    _, new, _, _ = dyn
    eng = PageRankEngine(new, num_cpus_per_actor=0.25)
    yield eng
    eng.shutdown()


def test_naive_dynamic_barrier(new_engine, warm, oracle_new):
    res = new_engine.run(mode="barrier", q=warm)
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)


def test_frontier_barrier(dyn, new_engine, warm, oracle_new):
    old, new, (ds_, dd_, is_, id_), _ = dyn
    fr = Frontier(old_layout=old, del_src=ds_, ins_src=is_)
    res = new_engine.run(mode="barrier", q=warm, frontier=fr)
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)
    assert res.variant == "frontier"


def test_frontier_barrierfree(dyn, new_engine, warm, oracle_new):
    old, new, (ds_, dd_, is_, id_), _ = dyn
    fr = Frontier(old_layout=old, del_src=ds_, ins_src=is_)
    res = new_engine.run(mode="barrierfree", q=warm, frontier=fr)
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)


def test_naive_dynamic_barrierfree(new_engine, warm, oracle_new):
    res = new_engine.run(mode="barrierfree", q=warm)
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)


def test_checkpoint_resume(dyn, new_engine, oracle_new, tmp_path):
    """Interrupt a run at iteration k (max_iter=k), resume from checkpoint,
    converge to the oracle fixed point."""
    ck = str(tmp_path / "ck")
    partial = new_engine.run(
        mode="barrier", max_iter=5, checkpoint_dir=ck, checkpoint_every=5
    )
    assert partial.residual > 1e-10  # genuinely interrupted mid-convergence
    latest = latest_checkpoint(ck)
    assert latest is not None
    meta = read_lineage(latest)
    assert meta["iteration"] == 5
    assert meta["graph_path"] == os.path.abspath(new_engine.layout.path)
    res = new_engine.run(mode="barrier", resume_from=latest)
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)


def test_crash_recovery_rebuild_actor(dyn, oracle_new, tmp_path):
    """Kill a partition actor mid-computation; recreate it from the layout +
    checkpoint and finish — the engine analogue of the reference's crashed
    threads being absorbed (`main.cxx:156-169`, README.md:110-127)."""
    import ray

    from pagerank_barrierfree_openmp_dynamic_ray.state.partition_actor import (
        CsrPartitionActor,
    )

    _, new, _, _ = dyn
    eng = PageRankEngine(new, num_cpus_per_actor=0.25)
    ck = str(tmp_path / "ck2")
    eng.run(mode="barrier", max_iter=4, checkpoint_dir=ck, checkpoint_every=4)
    latest = latest_checkpoint(ck)
    # crash-stop partition 1
    ray.kill(eng.actors[1])
    eng.actors[1] = CsrPartitionActor.options(num_cpus=0.25).remote(new.path, 1)
    ray.get(eng.actors[1].ready.remote())
    res = eng.run(mode="barrier", resume_from=latest)
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)
    eng.shutdown()


def test_barrierfree_sleep_faults(new_engine, oracle_new):
    """Slow partitions must not block the others (the reference's uniform
    sleep model, `main.cxx:137-153`): barrier-free converges to the same
    fixed point with one partition randomly sleeping."""
    res = new_engine.run(
        mode="barrierfree",
        fault={"sleep_prob": 0.5, "sleep_s": 0.02, "pids": {0}},
    )
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)


def test_barrierfree_crash_stop_bounded(new_engine, oracle_new):
    """Crash-stop of a partition (`main.cxx:156-169`): the run terminates
    (no hang — max_iter bounds the survivors), the crash is reported, and a
    warm-started recovery run reaches the fixed point."""
    res = new_engine.run(
        mode="barrierfree", max_iter=40,
        fault={"crash_at": 2, "pids": {1}},
    )
    assert res.iterations <= 40
    rec = new_engine.run(mode="barrier", q=res.ranks)
    np.testing.assert_allclose(rec.ranks, oracle_new, atol=1e-6)


def test_stochastic_vertex_faults_barrier(dyn, oracle_new):
    """Per-vertex stochastic fault model (`main.cxx:156-169`, grid
    `main.sh:33-42`): crash_prob per VERTEX per sweep.  Under a barrier, a
    crashed partition is rebuilt and the run still reaches the exact fixed
    point; per-vertex sleeps merely slow sweeps down."""
    _, new, _, _ = dyn
    eng = PageRankEngine(new, num_cpus_per_actor=0.25)
    try:
        # n_owned = 100 -> crash fires with 1-(1-p)^100 ~= 18% per sweep
        res = eng.run(mode="barrier",
                      fault={"crash_prob": 2e-3, "sleep_prob_v": 1e-3,
                             "sleep_s": 0.002})
        np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)
    finally:
        eng.shutdown()


def test_stochastic_vertex_faults_barrierfree(new_engine, oracle_new):
    """Barrier-free under the per-vertex model: crashed partitions
    crash-stop (last shard stays on the board), survivors terminate
    bounded, and a warm-started recovery reaches the fixed point — the
    reference's crashed-thread result shape."""
    res = new_engine.run(
        mode="barrierfree", max_iter=40,
        fault={"crash_prob": 5e-3, "sleep_prob_v": 1e-3, "sleep_s": 0.002},
    )
    assert res.iterations <= 40
    rec = new_engine.run(mode="barrier", q=res.ranks)
    np.testing.assert_allclose(rec.ranks, oracle_new, atol=1e-6)


def test_stochastic_faults_rank_quality_reference_rate(new_engine, oracle_new):
    """At the reference's published rate (crash p = 1e-5 per vertex,
    `main.sh:38`): crashed partitions freeze their last published shard, so
    barrier-free ranks stay CLOSE to the true fixed point — the reference's
    '56/64 threads crashed, ranks still usable' result shape — while the
    error is genuinely nonzero when a crash fired."""
    res = new_engine.run(mode="barrierfree", fault={"crash_prob": 1e-5})
    err = float(np.abs(res.ranks - oracle_new).max())
    assert err < 1e-3, err
    assert np.isfinite(res.ranks).all() and res.ranks.sum() > 0.5


def test_rank_topk_dataset_native(new_engine, oracle_new, tmp_path):
    """Dataset-native top-k over a checkpoint equals the numpy top-k."""
    from pagerank_barrierfree_openmp_dynamic_ray.state.checkpoint import rank_topk

    ck = str(tmp_path / "ck3")
    res = new_engine.run(mode="barrier", checkpoint_dir=ck, checkpoint_every=0)
    d = latest_checkpoint(ck)
    top = rank_topk(d, k=10).to_pandas()
    want_idx = np.lexsort((np.arange(len(res.ranks)), -res.ranks))[:10]
    assert top["vid"].tolist() == want_idx.tolist()
    np.testing.assert_allclose(top["rank"].to_numpy(), res.ranks[want_idx])


def test_barrierfree_async_checkpoint_resume(new_engine, oracle_new, tmp_path):
    """Barrier-less checkpointing: actors persist their own slices on their
    own schedule; a run interrupted mid-convergence resumes from the async
    dir (mixed-iteration parts are valid barrier-free state)."""
    ck = str(tmp_path / "ckbf")
    new_engine.run(
        mode="barrierfree", max_iter=4,
        checkpoint_dir=ck, checkpoint_every=2,
    )
    async_dir = os.path.join(ck, "async")
    assert os.path.isfile(os.path.join(async_dir, "lineage.json"))
    meta = read_lineage(async_dir)
    assert meta["mode"] == "barrierfree"
    res = new_engine.run(mode="barrierfree", resume_from=async_dir)
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)


def _layout_tables(layout):
    """(edges_in pairs/weights, edges_out pairs, degrees) fully sorted."""
    import pyarrow.parquet as pq

    def read_sorted(sub, cols):
        t = pq.read_table(os.path.join(layout.path, sub), columns=cols)
        arrs = [t[c].to_numpy(zero_copy_only=False) for c in cols]
        order = np.lexsort(arrs[::-1])
        return [a[order] for a in arrs]

    ecols = ["src", "dst", "w"] if layout.weighted else ["src", "dst"]
    return (
        read_sorted("edges_in", ecols),
        read_sorted("edges_out", ecols),
        read_sorted("degrees", ["vid", "deg"]),
    )


def test_incremental_matches_full_rebuild(dyn):
    """The incremental per-partition rewrite must produce byte-equal edge and
    degree tables to the full rebuild path (the reference's in-place delta,
    `src/Graph.hxx:343-360`)."""
    old, new, (ds_, dd_, is_, id_), root = dyn
    full = apply_batch_to_layout(
        old, str(root / "full"), ds_, dd_, is_, id_, incremental=False
    )
    assert new.n_edges == full.n_edges
    for got, want in zip(_layout_tables(new), _layout_tables(full)):
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


def test_incremental_matches_full_rebuild_weighted(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n, m = 120, 900
    src = rng.integers(0, n, m).astype(np.uint64)
    dst = rng.integers(0, n, m).astype(np.uint64)
    w = rng.uniform(0.5, 2.0, m)
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst),
                                 "w": pa.array(w)}))
    old = gb.build_graph(ds, str(tmp_path / "old"), num_partitions=3, n_vertices=n)
    assert old.weighted
    s0, d0 = layout_edge_arrays(old)
    dels_s, dels_d, ins_s, ins_d = generate_batch(s0, d0, n, batch_size=20, seed=9)
    inc = apply_batch_to_layout(old, str(tmp_path / "inc"), dels_s, dels_d,
                                ins_s, ins_d)
    full = apply_batch_to_layout(old, str(tmp_path / "full"), dels_s, dels_d,
                                 ins_s, ins_d, incremental=False)
    assert inc.n_edges == full.n_edges
    for got, want in zip(_layout_tables(inc), _layout_tables(full)):
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(g, w_)


def test_incremental_matches_full_rebuild_hot_split(ray_session, tmp_path):
    """Incremental apply on a HOT-SPLIT layout (VERDICT r02 item 2): the hot
    set is sticky (membership in hot.npy is the split predicate), batch
    endpoints route by recorded dst-hotness, and the resulting edge SET,
    degree table and routing invariants match a full rebuild exactly."""
    import pyarrow.parquet as pq
    import ray.data as rd

    rng = np.random.default_rng(17)
    n, m = 300, 3000
    src = rng.integers(0, n, m).astype(np.uint64)
    # skew ~30% of edges onto 8 celebrity vertices so the split engages
    celeb = rng.integers(0, 8, m).astype(np.uint64)
    dst = np.where(rng.random(m) < 0.3, celeb, rng.integers(0, n, m).astype(np.uint64))
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    old = gb.build_graph(ds, str(tmp_path / "old"), num_partitions=3,
                         n_vertices=n, hot_in_threshold=32)
    assert old.n_hot > 0
    s0, d0 = layout_edge_arrays(old)
    ds_, dd_, is_, id_ = generate_batch(s0, d0, n, batch_size=60, seed=5)
    # make sure the batch exercises BOTH routes
    hot = old.hot_vids()
    assert np.isin(id_, hot).any() and (~np.isin(id_, hot)).any()
    inc = apply_batch_to_layout(old, str(tmp_path / "inc"), ds_, dd_, is_, id_)
    full = apply_batch_to_layout(old, str(tmp_path / "full"), ds_, dd_, is_,
                                 id_, incremental=False)
    # logical edge set + count (full rebuild may re-detect a different hot
    # set — the SPLIT is physical, the edge set must be identical)
    si, di = layout_edge_arrays(inc)
    sf, df = layout_edge_arrays(full)
    np.testing.assert_array_equal(np.sort(si * n + di), np.sort(sf * n + df))
    assert inc.n_edges == full.n_edges
    # sticky hot metadata carried over
    assert inc.n_hot == old.n_hot
    assert inc.hot_in_threshold == old.hot_in_threshold
    np.testing.assert_array_equal(inc.hot_vids(), hot)
    # routing invariants per part: hot table rows have hot dst & src%P==p,
    # cold rows have non-hot dst & dst%P==p
    for p in range(3):
        hp = os.path.join(inc.path, "edges_in_hot", f"part={p}")
        if os.path.isdir(hp):
            t = pq.read_table(hp, columns=["src", "dst"])
            assert np.isin(t["dst"].to_numpy(zero_copy_only=False), hot).all()
            assert (t["src"].to_numpy(zero_copy_only=False) % 3 == p).all()
        cp = os.path.join(inc.path, "edges_in", f"part={p}")
        if os.path.isdir(cp):
            t = pq.read_table(cp, columns=["src", "dst"])
            assert not np.isin(t["dst"].to_numpy(zero_copy_only=False), hot).any()
            assert (t["dst"].to_numpy(zero_copy_only=False) % 3 == p).all()
    # degrees identical (split-independent)
    np.testing.assert_array_equal(
        np.array(_layout_tables(inc)[2]), np.array(_layout_tables(full)[2])
    )
    # and the PageRank fixed point agrees with the numpy oracle on the set
    s1, d1 = layout_edge_arrays(inc)
    want, _ = pagerank_power(s1, d1, n)
    eng = PageRankEngine(inc, num_cpus_per_actor=0.25)
    try:
        np.testing.assert_allclose(eng.run(mode="barrier").ranks, want, atol=1e-6)
    finally:
        eng.shutdown()


def test_barrier_crash_stop_recovers(dyn, oracle_new, tmp_path):
    """With-barrier twin of test_barrierfree_crash_stop_bounded
    (`main.cxx:156-169`): a partition actor crash-stops mid-run via fault
    injection; the driver detects the dead barrier participant, rebuilds it
    from the layout (+ checkpoint when one exists), and the run still reaches
    the fixed point."""
    _, new, _, _ = dyn
    eng = PageRankEngine(new, num_cpus_per_actor=0.25)
    try:
        res = eng.run(mode="barrier", fault={"crash_at": 2, "pids": {1}})
        np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)
        # with checkpointing: recovery restores from the checkpoint slice
        ck = str(tmp_path / "ckc")
        res2 = eng.run(mode="barrier", fault={"crash_at": 3, "pids": {2}},
                       checkpoint_dir=ck, checkpoint_every=2)
        np.testing.assert_allclose(res2.ranks, oracle_new, atol=1e-6)
    finally:
        eng.shutdown()


def test_barrierfree_sharded_board(dyn, warm, oracle_new, new_engine):
    """Sharded barrier-free board (one shard per few partitions + a
    message-counting coordinator): same fixed point as the single board for
    static AND dynamic-frontier (cross-shard mark forwarding + safe
    termination — no stop while a mark is in flight)."""
    old, new, (ds_, dd_, is_, id_), _ = dyn
    res = new_engine.run(mode="barrierfree", board_shards=3)
    np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)
    fr = new_engine.run(
        mode="barrierfree", q=warm, board_shards=3,
        frontier=Frontier(old_layout=old, del_src=ds_, ins_src=is_),
    )
    np.testing.assert_allclose(fr.ranks, oracle_new, atol=1e-6)


def test_generate_batch_from_layout(dyn):
    """Distributed batch generation (edge list never on the driver): picks
    are real unique edges of the layout, insertions are in range, and the
    batch drives the dynamic pipeline end to end."""
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.updates import (
        generate_batch_from_layout,
    )

    old, _, _, root = dyn
    ds_, dd_, is_, id_ = generate_batch_from_layout(old, 30, seed=13)
    assert len(ds_) == 30 and len(is_) == 30
    s0, d0 = layout_edge_arrays(old)
    pairs = set(zip(s0.tolist(), d0.tolist()))
    keys = set()
    for u, v in zip(ds_.tolist(), dd_.tolist()):
        assert (u, v) in pairs
        keys.add((u, v))
    assert len(keys) == 30  # no duplicate deletions
    assert is_.max() < old.n_vertices and id_.max() < old.n_vertices
    upd = apply_batch_to_layout(old, str(root / "from_layout"), ds_, dd_, is_, id_)
    s1, d1 = layout_edge_arrays(upd)
    new_pairs = set(zip(s1.tolist(), d1.tolist()))
    for u, v in zip(is_.tolist(), id_.tolist()):
        assert (u, v) in new_pairs


def test_crash_stop_semantics_and_sleep_retention(dyn, oracle_new):
    """Crash-stop semantics (documented next to the rebuild branch): each
    partition crashes AT MOST ONCE per run — the reference's permanently-
    dead-thread model — the caller's fault dict is never mutated, rebuilt
    partitions keep their sleep injection, and the run still reaches the
    exact fixed point."""
    _, new, _, _ = dyn
    eng = PageRankEngine(new, num_cpus_per_actor=0.25)
    fault = {"crash_prob": 2e-3, "sleep_prob_v": 1e-3, "sleep_s": 0.002}
    try:
        res = eng.run(mode="barrier", fault=fault)
        np.testing.assert_allclose(res.ranks, oracle_new, atol=1e-6)
        assert fault == {"crash_prob": 2e-3, "sleep_prob_v": 1e-3,
                         "sleep_s": 0.002}
        assert 1 <= res.stats["crashed_partitions"] <= 3
    finally:
        eng.shutdown()
