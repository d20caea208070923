"""End-to-end drive in a fresh interpreter: corpus -> extraction ->
pages graph build -> PageRank (barrier + barrier-free) vs numpy oracle ->
symmetric layout -> CC vs union-find oracle -> dedup-mode equivalence ->
driver-contract query vs its DuckDB twin."""
import numpy as np, ray, shutil, duckdb

ray.init(address="local", num_cpus=8, include_dashboard=False)
import ray.data as rd
from pagerank_barrierfree_openmp_dynamic_ray.sources.pages import write_pages
from pagerank_barrierfree_openmp_dynamic_ray.functions.extract import extract_texts
from pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build import (
    build_graph, build_graph_from_pages)
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import PageRankEngine
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.components import (
    LabelEngine, build_symmetric_layout)
from pagerank_barrierfree_openmp_dynamic_ray.functions import oracle

corpus = "/tmp/verify_corpus"
shutil.rmtree(corpus, ignore_errors=True)
write_pages(corpus, n_pages=2000, seed=11)

# 1) extraction byte-identity
t_ref = rd.read_parquet(corpus).select_columns(["url", "text"]).to_pandas().sort_values("url")
t_got = extract_texts(rd.read_parquet(corpus)).to_pandas().sort_values("url")
assert list(t_ref.text) == list(t_got.text), "extraction byte-identity FAILED"
print("extract byte-identity: OK", len(t_ref), "pages")

# 2) pages -> graph -> PageRank vs oracle
shutil.rmtree("/tmp/verify_layout", ignore_errors=True)
lay = build_graph_from_pages(rd.read_parquet(corpus), "/tmp/verify_layout", 4)
edges = rd.read_parquet(lay.edges_out).select_columns(["src", "dst"]).to_pandas()
assert len(edges.drop_duplicates()) == len(edges) == lay.n_edges, "dup/count drift"
src, dst = edges.src.values.astype(np.int64), edges.dst.values.astype(np.int64)
assert (src == dst).sum() == lay.n_vertices, "self-loops != V"
print(f"layout: V={lay.n_vertices} E={lay.n_edges} selfloops==V distinct==E OK")
want, _ = oracle.pagerank_power(src, dst, lay.n_vertices)
eng = PageRankEngine(lay, num_cpus_per_actor=0.9)
# rank-sum tolerance: barrier is deterministic (~1e-15); barrier-free is
# ASYNC — the library contract is 1e-6 (tests/test_pagerank.py:66), not
# tighter: mid-sweep reads legitimately leave sub-1e-6 mass jitter.
for mode, sum_tol in (("barrier", 1e-9), ("barrierfree", 1e-6)):
    rr = eng.run(mode=mode)
    dsum = abs(rr.ranks.sum() - 1.0)
    assert dsum < sum_tol, f"rank_sum {mode}: |sum-1|={dsum:.2e}"
    linf = np.abs(rr.ranks - want).max()
    assert linf < 1e-6, f"{mode} vs oracle linf={linf}"
    print(f"pagerank[{mode}]: iters={rr.iterations} "
          f"linf_vs_oracle={linf:.2e} |sum-1|={dsum:.2e} OK")
eng.shutdown()

# 3) CC on a symmetric layout vs union-find oracle
rng = np.random.default_rng(5)
n = 4000
s2 = rng.integers(0, n, 2500); d2 = rng.integers(0, n, 2500)
eds = rd.from_arrow(__import__("pyarrow").table(
    {"src": s2.astype(np.uint64), "dst": d2.astype(np.uint64)}))
shutil.rmtree("/tmp/verify_sym", ignore_errors=True)
sym = build_symmetric_layout(eds, "/tmp/verify_sym", 4, n_vertices=n)
le = LabelEngine(sym, num_cpus_per_actor=0.9)
res = le.connected_components()
le.shutdown()
np.testing.assert_array_equal(res.labels, oracle.connected_components(s2, d2, n))
print(f"cc: {len(np.unique(res.labels))} components in {res.iterations} iters == oracle OK")

# 4) dedup-mode equivalence: same edge multiset with dups, both build modes
dup_src = np.concatenate([s2, s2[:1000]]).astype(np.uint64)
dup_dst = np.concatenate([d2, d2[:1000]]).astype(np.uint64)
stats = {}
for mode in ("shuffle", "partition_local"):
    out = f"/tmp/verify_dm_{mode}"
    shutil.rmtree(out, ignore_errors=True)
    eds2 = rd.from_arrow(__import__("pyarrow").table({"src": dup_src, "dst": dup_dst}))
    l2 = build_graph(eds2, out, 4, n_vertices=n)
    deg = rd.read_parquet(l2.degrees).to_pandas().sort_values("vid").reset_index(drop=True)
    stats[mode] = (l2.n_vertices, l2.n_edges, deg)
assert stats["shuffle"][0] == stats["partition_local"][0]
assert stats["shuffle"][1] == stats["partition_local"][1]
import pandas as pd
pd.testing.assert_frame_equal(stats["shuffle"][2], stats["partition_local"][2])
print(f"dedup modes identical: V={stats['shuffle'][0]} E={stats['shuffle'][1]} degrees bit-equal OK")

# 5) driver contract: one query vs its DuckDB twin
import __ray_entry__ as e
sf = "/root/testdata/sf0.001"
q = e.queries()["lg_degree"](sf)
qq = q.to_pandas() if hasattr(q, "to_pandas") else q
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
ref = con.execute(e.oracle_sql()["lg_degree"]).df()
cols = sorted(qq.columns)
assert cols == sorted(ref.columns) and len(qq) == len(ref), "lg_degree shape"
a = qq[cols].sort_values(cols).reset_index(drop=True).astype("int64")
b = ref[cols].sort_values(cols).reset_index(drop=True).astype("int64")
pd.testing.assert_frame_equal(a, b)
print("lg_degree vs duckdb twin: values equal,", len(a), "rows OK")
ray.shutdown()
print("VERIFY: ALL OK")
