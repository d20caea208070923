"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship link-graph pipeline on sf0.001;
``queries()[name](sf_dir)`` are the operator pipelines from SURVEY §2 (plus
the training-data operators); ``oracle_sql()[name]`` are their exact DuckDB
twins where the semantics are SQL-expressible (identical column names and
integer/IEEE-identical arithmetic by construction).  Ray is initialised by
the driver BEFORE this module is imported — nothing here calls
``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from pagerank_barrierfree_openmp_dynamic_ray.functions import sqltwins
from pagerank_barrierfree_openmp_dynamic_ray.functions.redact import (
    EMAIL_RE as _EMAIL_RE,
    IPV4_RE as _IPV4_RE,
)
from pagerank_barrierfree_openmp_dynamic_ray.pipelines.derived import (
    V,
    derived_edge_sql,
    derived_edges,
    derived_layout,
)

# ---------------------------------------------------------------------------
# shared SQL fragments (must mirror stages/graph_build.build_graph exactly:
# dedup, drop self-loops, re-add a self-loop for EVERY vertex 0..V-1)
# ---------------------------------------------------------------------------

_E = derived_edge_sql()
_FULL_E = f"""
WITH raw AS ({_E}),
     e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
     loops AS (SELECT x.range::BIGINT AS v FROM range({V}) x),
     full_e AS (SELECT src, dst FROM e UNION ALL SELECT v, v FROM loops)
"""

_TOK = "regexp_extract_all(text, '\\S+')"
_PIECES = "regexp_extract_all(text, '[0-9A-Za-z_]+|[^0-9A-Za-z_\\s]')"
_STOP = "('the','and','of','to','a','in','is','it')"


_AUX_LAYOUT_CACHE: dict[str, Any] = {}


def _cached_layout(key: str, builder):
    """Per-process memo for derived layouts (symmetric / weighted): the
    driver calls several queries over the same sf_dir — build each layout
    once (same pattern as pipelines.derived._LAYOUT_CACHE)."""
    if key not in _AUX_LAYOUT_CACHE:
        _AUX_LAYOUT_CACHE[key] = builder()
    return _AUX_LAYOUT_CACHE[key]


def _i64(df):
    """Normalize integer columns to int64 for the value-hash compare.
    Returns a new frame (``astype`` copy) rather than mutating in place —
    some callers pass column-slices of larger frames."""
    import pandas as pd

    conv = {c: "int64" for c in df.columns
            if pd.api.types.is_integer_dtype(df[c])}
    return df.astype(conv) if conv else df


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------

def _q_lg_degree(sf_dir: str):
    import ray.data as rd

    lay = derived_layout(sf_dir)
    df = rd.read_parquet(lay.degrees).to_pandas()
    return _i64(df[["vid", "deg"]])


def _q_lg_counts(sf_dir: str):
    import pandas as pd

    lay = derived_layout(sf_dir)
    return pd.DataFrame({"n_vertices": [lay.n_vertices], "n_edges": [lay.n_edges]})


def _q_lg_selfloops(sf_dir: str):
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build import (
        self_loop_count,
    )

    n = self_loop_count(derived_edges(sf_dir))
    return pd.DataFrame({"n_selfloops": [int(n)]})


def _q_mtx_roundtrip(sf_dir: str):
    """MatrixMarket interchange (`src/mtx.hxx:33-180`): the derived deduped
    graph is written to .mtx and read back; the row reports the round-trip
    edge/vertex counts (read-back count == layout count proves the parse).
    Rows-only: the DuckDB views cannot read .mtx."""
    import tempfile

    import pandas as pd
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.sources.mtx import (
        read_mtx,
        write_mtx,
    )

    lay = derived_layout(sf_dir)
    edges = rd.read_parquet(lay.edges_in, columns=["src", "dst"])
    p = os.path.join(tempfile.gettempdir(), "graft_layouts",
                     os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_")
                     + ".mtx")
    write_mtx(edges, p, lay.n_vertices, n_edges=lay.n_edges)
    back, nv = read_mtx(p)
    return pd.DataFrame({
        "n_vertices": [int(nv)],
        "n_edges_written": [int(lay.n_edges)],
        "n_edges_read": [int(back.count())],
    })


def _q_lg_top_indegree(sf_dir: str):
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build import (
        out_degrees,
        transpose,
    )

    lay = derived_layout(sf_dir)
    edges = rd.read_parquet(lay.edges_in, columns=["src", "dst"])
    indeg = out_degrees(transpose(edges))
    top = indeg.rename_columns({"deg": "indeg"}).sort(
        ["indeg", "vid"], descending=[True, False]
    ).limit(20)
    return _i64(top.to_pandas())


def _q_lg_triangles(sf_dir: str):
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.triangles import (
        triangle_count,
    )

    t = triangle_count(derived_edges(sf_dir), V)
    return pd.DataFrame({"triangles": [int(t)]})


# ---------------------------------------------------------------------------
# PageRank / components / labels.  The deterministic synchronous surfaces
# (barrier static / dead / weighted / HOT-SPLIT, CC, LP) have exact DuckDB
# twins built as UNROLLED sweep chains (functions/sqltwins.py) — hot-split
# qualifies because splitting only re-partitions the pull sum, whose partial
# results are reduced in a fixed slot order, so the trajectory is bit-equal
# to the plain barrier run (measured: 0.0 max rank diff vs the twin over
# repeated runs at sf0.01).  The asynchronous ones (barrierfree, frontier)
# land within ~5e-10 of the fixed point but NOT on the synchronous
# trajectory the SQL reproduces, so a raw rank value-hash flakes at every
# useful rounding; they are SQL-checked via INVARIANT twins instead
# (sqltwins.pagerank_vids_sql): the stable top-20 vid set plus an
# engine-computed |async - sync| < 1e-6 flag per vid.
# ---------------------------------------------------------------------------

def _pr_engine(sf_dir: str):
    """Fresh engine per query with fractional actor CPUs: pinned actors must
    never reserve the whole session or subsequent Dataset stages starve
    (actor pools and map tasks share one CPU budget)."""
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
        PageRankEngine,
    )

    return PageRankEngine(derived_layout(sf_dir), num_cpus_per_actor=0.25)


def _top20_df(ranks: np.ndarray):
    import pandas as pd

    idx = np.lexsort((np.arange(len(ranks)), -ranks))[:20]
    return pd.DataFrame(
        {"vid": idx.astype("int64"), "rank": np.round(ranks[idx], 12)}
    )


def _q_pr_top20(sf_dir: str):
    """Static PageRank consumed DATASET-NATIVELY end to end: the run never
    materializes the dense |V| rank vector on the driver
    (``run(collect=False)``); the top-20 comes from the per-partition rank
    checkpoint via ``rank_topk`` (partial top-k combiner + one small sort) —
    the consumption shape that survives |V| > one machine."""
    import shutil
    import tempfile

    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_ray.state.checkpoint import (
        latest_checkpoint,
        rank_topk,
    )

    eng = _pr_engine(sf_dir)
    ck = tempfile.mkdtemp(prefix="graft_pr_ck_")
    try:
        res = eng.run(mode="barrier", checkpoint_dir=ck, collect=False)
        assert res.ranks is None  # nothing dense ever reached the driver
        top = rank_topk(latest_checkpoint(ck), k=20).to_pandas()
        return pd.DataFrame({
            "vid": top["vid"].astype("int64"),
            "rank": np.round(top["rank"].to_numpy(), 12),
        })
    finally:
        eng.shutdown()
        shutil.rmtree(ck, ignore_errors=True)


def _async_top20_within(ranks_async: np.ndarray, ranks_sync: np.ndarray,
                        tol: float = 1e-6):
    """(vid, within_tol) for the async run's top-20: vids are stable (the
    20/21 rank gap is ~1.1e-6 vs ~5.6e-10 async noise at sf0.01, measured
    over repeated runs), and within_tol asserts fixed-point agreement with
    the synchronous trajectory the SQL twin reproduces — 1e-6 is ~2000x the
    measured max deviation, yet ~15x below the smallest top-20 rank."""
    import pandas as pd

    idx = np.lexsort((np.arange(len(ranks_async)), -ranks_async))[:20]
    ok = np.abs(ranks_async[idx] - ranks_sync[idx]) < tol
    order = np.argsort(idx)
    return pd.DataFrame({
        "vid": idx[order].astype("int64"),
        "within_tol": ok[order].astype("int64"),
    })


def _q_pr_barrierfree_top20(sf_dir: str):
    """Barrier-free async PageRank, SQL-checked via the invariant twin
    (sqltwins.pagerank_vids_sql): the async top-20 vid set must equal the
    synchronous fixpoint's, and every async rank must sit within 1e-6 of the
    engine's own synchronous run at those vids."""
    eng = _pr_engine(sf_dir)
    try:
        ranks_async = eng.run(mode="barrierfree").ranks
        ranks_sync = eng.run(mode="barrier").ranks
    finally:
        eng.shutdown()
    return _async_top20_within(ranks_async, ranks_sync)


# fixed dump path so oracle_sql() (built at import, sf-independent) can read
# the query's updated graph; the query rewrites it on every call, so the twin
# always sees the edges of the run being checked
_FRONTIER_DUMP = os.path.join(tempfile.gettempdir(), "graft_oracle_dumps",
                              "frontier_upd_edges")


def _q_pr_dynamic_frontier_top20(sf_dir: str):
    """Dynamic-frontier PageRank after a seeded edge batch, SQL-checked via
    the invariant twin: the updated graph's edges are dumped to parquet and
    the twin runs the unrolled sweep over them — the frontier run's top-20
    vid set must match the full-recompute fixpoint, with every frontier rank
    within 1e-6 of the engine's own full recompute (measured max deviation
    5.4e-10 at sf0.01; the seeded batch is deterministic)."""
    import shutil
    import tempfile

    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
        Frontier,
        PageRankEngine,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.updates import (
        apply_batch_to_layout,
        generate_batch_from_layout,
    )

    old = derived_layout(sf_dir)
    eng = _pr_engine(sf_dir)
    warm = eng.run(mode="barrier").ranks
    eng.shutdown()
    ds_, dd_, is_, id_ = generate_batch_from_layout(
        old, max(1, old.n_edges // 1000))
    out = os.path.join(tempfile.gettempdir(), "graft_layouts",
                       os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_") + "_upd")
    new = apply_batch_to_layout(old, out, ds_, dd_, is_, id_)
    shutil.rmtree(_FRONTIER_DUMP, ignore_errors=True)
    rd.read_parquet(new.edges_in, columns=["src", "dst"]).write_parquet(
        _FRONTIER_DUMP)

    eng2 = PageRankEngine(new, num_cpus_per_actor=0.25)
    try:
        ranks_frontier = eng2.run(
            mode="barrier", q=warm,
            frontier=Frontier(old_layout=old, del_src=ds_, ins_src=is_)).ranks
        ranks_full = eng2.run(mode="barrier").ranks
    finally:
        eng2.shutdown()
    return _async_top20_within(ranks_frontier, ranks_full)


def _q_pr_hot_split_top20(sf_dir: str):
    """Static PageRank on a layout built WITH hot-vertex splitting forced on
    (threshold 8 marks the top in-degree vertices hot on the derived graph).
    SQL-checked against the same unrolled-sweep twin as pr_top20: the split
    re-partitions the pull sum but partials reduce in a fixed slot order, so
    the trajectory — and hence the stopping sweep and the rounded ranks — is
    bit-identical to the plain barrier run (measured 0.0 diff, repeated)."""
    import tempfile

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
        PageRankEngine,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build import build_graph

    out = os.path.join(tempfile.gettempdir(), "graft_layouts",
                       os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_") + "_hot")
    lay = build_graph(derived_edges(sf_dir), out, 8, n_vertices=V,
                      hot_in_threshold=8)
    eng = PageRankEngine(lay, num_cpus_per_actor=0.25)
    try:
        return _top20_df(eng.run(mode="barrier").ranks)
    finally:
        eng.shutdown()


def _q_pr_dead_top20(sf_dir: str):
    """DEAD-mode (teleport) static PageRank on a NO-self-loop layout
    (``pagerankTeleport``, `src/pagerank.hxx:157-184`): dead-end rank mass
    is redistributed uniformly each iteration instead of being retained by
    the self-loop trick.  SQL-checked (unrolled teleport sweeps); the numpy
    teleport oracle is additionally pinned in tests/test_pagerank.py."""
    import tempfile

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
        PageRankEngine,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build import build_graph

    out = os.path.join(tempfile.gettempdir(), "graft_layouts",
                       os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_")
                       + "_noloop")
    lay = _cached_layout(out, lambda: build_graph(
        derived_edges(sf_dir), out, 8, n_vertices=V, add_loops=False
    ))
    eng = PageRankEngine(lay, num_cpus_per_actor=0.25)
    try:
        return _top20_df(eng.run(mode="barrier", dead=True).ranks)
    finally:
        eng.shutdown()


def _q_pr_weighted_top20(sf_dir: str):
    """Weighted static PageRank (the reference's weighted read path,
    `src/mtx.hxx:68-72`): derived edges carry w = (l_quantity % 5) + 1;
    duplicate links sum.  SQL-checked (unrolled weighted sweeps); the numpy
    weighted oracle is additionally pinned in tests/test_weighted.py."""
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
        PageRankEngine,
    )

    eng = PageRankEngine(_weighted_layout(sf_dir), num_cpus_per_actor=0.25)
    try:
        return _top20_df(eng.run(mode="barrier").ranks)
    finally:
        eng.shutdown()


_WEIGHTED_E = (
    "SELECT (l_orderkey * 131 + l_linenumber) % 65521 AS src, "
    "(l_partkey * 524287 + l_suppkey) % 65521 AS dst, "
    "(CAST(l_quantity AS BIGINT) % 5) + 1 AS w FROM lineitem"
)


def _weighted_layout(sf_dir: str):
    import tempfile

    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build import build_graph

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                 "l_quantity"],
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qt = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(((ok * 131 + ln) % V).astype(np.uint64)),
                "dst": pa.array(((pk * 524287 + sk) % V).astype(np.uint64)),
                "w": pa.array(((qt % 5) + 1).astype(np.float64)),
            }
        )

    out = os.path.join(tempfile.gettempdir(), "graft_layouts",
                       os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_") + "_w")
    return _cached_layout(out, lambda: build_graph(
        li.map_batches(to_edges, batch_format="pyarrow"), out, 8, n_vertices=V
    ))


def _q_lg_wdegree(sf_dir: str):
    """Weighted out-degree table of the weighted derived layout — integer
    weight sums in float64 are exact, so the DuckDB twin matches
    bit-for-bit."""
    import ray.data as rd

    lay = _weighted_layout(sf_dir)
    df = rd.read_parquet(lay.degrees, columns=["vid", "deg"]).to_pandas()
    df["deg"] = df["deg"].astype("int64")  # exact integer sums
    return _i64(df[["vid", "deg"]])


def _sym_layout(sf_dir: str):
    import tempfile

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.components import (
        symmetric_layout_from,
    )

    out = os.path.join(tempfile.gettempdir(), "graft_layouts",
                       os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_") + "_sym")
    return _cached_layout(out, lambda: symmetric_layout_from(
        derived_layout(sf_dir), out
    ))


def _labels_df(sf_dir: str, algo: str, out_col: str):
    """Run a label algorithm DATASET-NATIVELY (``collect=False`` — no dense
    |V| vector on the driver, mirroring pr_top20's shape) and read the
    per-partition label checkpoint back as the result table."""
    import shutil
    import tempfile

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.components import (
        LabelEngine,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.state.checkpoint import (
        labels_dataset,
    )

    eng = LabelEngine(_sym_layout(sf_dir), num_cpus_per_actor=0.25)
    ck = tempfile.mkdtemp(prefix="graft_lab_ck_")
    try:
        res = getattr(eng, algo)(collect=False, checkpoint_dir=ck)
        assert res.labels is None  # nothing dense ever reached the driver
        df = labels_dataset(ck).to_pandas().sort_values("vid")
        df = df.rename(columns={"label": out_col}).reset_index(drop=True)
        return _i64(df)
    finally:
        eng.shutdown()
        shutil.rmtree(ck, ignore_errors=True)


def _q_cc_components(sf_dir: str):
    return _labels_df(sf_dir, "connected_components", "component")


# ---------------------------------------------------------------------------
# documents / embeddings / events queries
# ---------------------------------------------------------------------------

def _docs(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.functions.io import read_parquet_sized

    return read_parquet_sized(os.path.join(sf_dir, "documents.parquet"))


def _q_doc_token_counts(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.functions.textstats import token_counts

    return _i64(token_counts(_docs(sf_dir)).to_pandas())


def _q_doc_token_freq(sf_dir: str):
    """Corpus heavy hitters: every token covering >= 0.1% of the token
    stream, EXACT counts (`stages/frequency.py::frequent_values` — per-batch
    Arrow combiner, one hash(value)%P shuffle co-locating each value, local
    threshold filter; the Misra-Gries compressed regime is pytest-pinned).
    DuckDB twin is the plain GROUP BY ... HAVING over the unnested tokens —
    tokenizer parity (Arrow whitespace split == regexp '\\S+') is pinned in
    tests/test_frequency.py."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.frequency import (
        frequent_values,
        tokenize_column,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])
    toks = tokenize_column(docs, "text", "token")
    return _i64(frequent_values(toks, "token", phi=0.001, num_partitions=16))


def _q_doc_quality(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.functions.textstats import (
        quality_scores,
    )

    return _i64(quality_scores(_docs(sf_dir)).to_pandas())


def _q_doc_lang_id(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.functions.textstats import lang_ids

    return _i64(lang_ids(_docs(sf_dir)).to_pandas())


def _q_doc_fingerprint(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.functions.textstats import fingerprints

    return _i64(fingerprints(_docs(sf_dir)).to_pandas()[["doc_id", "md5"]])


def _pii_inject_batch(batch: pa.Table) -> pa.Table:
    """Harness-only corpus prep for the redact oracle: the synthetic docs
    contain no emails/IPs, so append a deterministic PII suffix derived from
    doc_id (same expression in the DuckDB twin) — otherwise the oracle would
    vacuously compare all-zero counts and never exercise the RE2 kernels."""
    import pyarrow.compute as pc

    did = batch["doc_id"].to_numpy(zero_copy_only=False)
    sfx = pa.array(
        [
            " u%d@ex%d.org ip 10.0.%d.%d" % (d, d % 7, d % 256, d % 100)
            for d in did
        ]
    )
    text = pc.binary_join_element_wise(
        pc.cast(batch["text"], pa.string()), sfx, ""
    )
    return batch.set_column(batch.schema.get_field_index("text"), "text", text)


def _q_doc_redact(sf_dir: str):
    """PII scrub report: per-doc email / IPv4 match counts and the md5 of
    the redacted text.  Both the replace and the count are single RE2
    kernels (`pyarrow.compute`) shared verbatim with the DuckDB twin."""
    from pagerank_barrierfree_openmp_dynamic_ray.functions.redact import (
        redactions,
    )

    docs = _docs(sf_dir).map_batches(_pii_inject_batch, batch_format="pyarrow")
    return _i64(redactions(docs).to_pandas())


def _lines_from_tokens_batch(batch: pa.Table) -> pa.Table:
    """Harness-only corpus prep for the repetition oracle: the synthetic
    docs are single-line, so turn the token stream into one-token-per-line
    text (``replace(text, ' ', chr(10))`` in the twin) — repeated tokens
    then exercise the duplicate-line counting for real."""
    import pyarrow.compute as pc

    text = pc.replace_substring(
        pc.cast(batch["text"], pa.string()), pattern=" ", replacement="\n"
    )
    return batch.set_column(batch.schema.get_field_index("text"), "text", text)


def _q_doc_repetition(sf_dir: str):
    """Duplicate-line repetition stats (RefinedWeb boilerplate signal):
    non-empty line count, duplicate-line count and fraction per doc."""
    from pagerank_barrierfree_openmp_dynamic_ray.functions.textstats import (
        repetitions,
    )

    docs = _docs(sf_dir).map_batches(
        _lines_from_tokens_batch, batch_format="pyarrow"
    )
    return _i64(repetitions(docs).to_pandas())


def _q_doc_decontam(sf_dir: str):
    """Benchmark decontamination: every doc with >=3 tokens is scored
    against the broadcast distinct-shingle set of the 'benchmark' docs
    (deterministically ``doc_id % 31 == 0`` — the sandbox stand-in for a
    held-out eval suite).  Counts are distinct word-3-gram overlaps; the
    engine computes them on 64-bit shingle hashes, the twin on the strings
    (equal absent collisions, same trade as doc_repetition)."""
    import pyarrow.compute as pc

    from pagerank_barrierfree_openmp_dynamic_ray.stages.decontam import (
        benchmark_shingles,
        contamination,
    )

    def tok_ok(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(
                pc.count_substring_regex(batch["text"], pattern="\\S+"), 3
            )
        )

    def side(batch: pa.Table, bench: bool) -> pa.Table:
        m = batch["doc_id"].to_numpy(zero_copy_only=False) % 31 == 0
        return batch.filter(pa.array(m if bench else ~m))

    docs = _docs(sf_dir).map_batches(tok_ok, batch_format="pyarrow")
    ref = benchmark_shingles(
        docs.map_batches(side, fn_kwargs={"bench": True},
                         batch_format="pyarrow"))
    train = docs.map_batches(side, fn_kwargs={"bench": False},
                             batch_format="pyarrow")
    return _i64(contamination(train, ref).to_pandas())


def _q_doc_exact_dedup(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import exact_dedup

    return _i64(exact_dedup(_docs(sf_dir)).to_pandas())


def _q_doc_dedup_kept(sf_dir: str):
    """The deduplicated document SET (smallest doc_id per content) via the
    scale plan — ONE hash(md5)%P shuffle, no keeper-id broadcast."""
    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import (
        exact_dedup_keep_first,
    )

    kept = exact_dedup_keep_first(_docs(sf_dir)).select_columns(["doc_id"])
    return _i64(kept.to_pandas())


def _q_doc_minhash_pairs(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import minhash_lsh_pairs

    df = minhash_lsh_pairs(_docs(sf_dir), threshold=0.5).to_pandas()
    df["jaccard"] = np.round(df["jaccard"], 9)
    return _i64(df)


# (sf_dir, tag) -> cluster table; the table is a pure function of the pair
# source, so queries sharing a source (doc_dup_clusters / doc_leak_split)
# compute the graph-build + CC pipeline ONCE per driver pass (ADVICE r04)
_CLUSTER_CACHE: dict[tuple[str, str], tuple] = {}


def _cluster_table(pairs_fn, sf_dir: str, tag: str):
    """Run ``stages/dedup.dup_clusters`` on ``pairs_fn()`` and return the
    cluster table as (sorted endpoint ids, aligned representatives) — the
    duplicated subset only, small by construction.  ``pairs_fn`` is a thunk
    so a cache hit skips even the pair-source construction (minhash
    signature stages run at call time).  Memoized per (sf_dir, tag); the
    throwaway layout dir carries the PID so concurrent driver/pytest
    processes never rmtree each other's mid-read layout (ADVICE r04), and
    is deleted once the table is collected."""
    import shutil

    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import dup_clusters

    key = (os.path.abspath(sf_dir), tag)
    if key in _CLUSTER_CACHE:
        return _CLUSTER_CACHE[key]
    pairs = pairs_fn()
    work = os.path.join(
        tempfile.gettempdir(), "graft_layouts",
        os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_")
        + f"{tag}_pid{os.getpid()}")
    try:
        clus = dup_clusters(pairs, work).to_pandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ids = clus["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    _CLUSTER_CACHE[key] = (
        ids[order], clus["cluster_id"].to_numpy().astype(np.int64)[order])
    return _CLUSTER_CACHE[key]


def _cluster_assign(all_ids_ds, id_col: str, pairs_fn, sf_dir: str, tag: str):
    """Shared tail of the *_dup_clusters queries: give EVERY row its cluster
    id (itself when unpaired) + ``keep = id == cluster_id`` via one
    broadcast ``cluster_lookup`` per block."""
    import ray

    from pagerank_barrierfree_openmp_dynamic_ray.stages.sampling import (
        cluster_lookup,
    )

    ref = ray.put(_cluster_table(pairs_fn, sf_dir, tag))

    def assign(batch: pa.Table) -> pa.Table:
        ids_s, labs = ray.get(ref)
        d = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cid = cluster_lookup(ids_s, labs, d)
        return pa.table({
            id_col: pa.array(d), "cluster_id": pa.array(cid),
            "keep": pa.array((d == cid).astype(np.int64)),
        })

    out = (all_ids_ds.select_columns([id_col])
           .map_batches(assign, batch_format="pyarrow").to_pandas())
    return _i64(out.sort_values(id_col).reset_index(drop=True))


def _q_doc_dup_clusters(sf_dir: str):
    """Near-dup cluster assignment + canonical-doc selection: every document
    gets the smallest doc id of its minhash-pair connected component as
    ``cluster_id`` (itself when unpaired) and ``keep = doc_id == cluster_id``
    — the keep-one-per-near-dup-cluster step of a training-data pipeline.
    Runs ``stages/dedup.dup_clusters`` (endpoint dense-remap -> symmetric
    GraphLayout -> LabelEngine connected components -> label mapback); the
    DuckDB twin closes the same pair set with a recursive transitive-closure
    CTE (``functions/sqltwins.dup_clusters_sql``)."""
    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import (
        minhash_lsh_pairs,
    )

    return _cluster_assign(
        _docs(sf_dir), "doc_id",
        lambda: minhash_lsh_pairs(_docs(sf_dir), threshold=0.5),
        sf_dir, "_dupc")


def _q_doc_leak_split(sf_dir: str):
    """Leakage-safe train/val split: ``split`` is a pure hash function of
    each document's near-dup CLUSTER id (the minhash-pair component
    representative), so near-duplicates can never straddle the boundary —
    a plain row-hash split would leak val content into train via
    near-copies.  Runs ``stages/sampling.leakage_safe_split`` over the
    ``dup_clusters`` table; twin = the recursive-closure CTE + the same
    HUGEINT hash predicate on the cluster id."""
    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import (
        minhash_lsh_pairs,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.stages.sampling import (
        leakage_safe_split,
    )

    # same pair source as _q_doc_dup_clusters => same memoized cluster table
    ids, labels = _cluster_table(
        lambda: minhash_lsh_pairs(_docs(sf_dir), threshold=0.5),
        sf_dir, "_dupc")
    out = leakage_safe_split(
        _docs(sf_dir), "doc_id", ids, labels, val_ppm=100_000,
    ).to_pandas()
    return _i64(out.sort_values("doc_id").reset_index(drop=True))


def _q_emb_dup_clusters(sf_dir: str):
    """The same cluster operator over EMBEDDING near-dup pairs (cosine >=
    0.45, the hash-green ``emb_near_dup`` set) — semantic dedup: each vector
    labeled with its component's smallest vec_id, keep-one-per-cluster.
    Twin: the recursive-closure CTE over the embedding pair SQL."""
    from pagerank_barrierfree_openmp_dynamic_ray.stages.similarity import (
        near_dup_cosine,
    )

    def pairs_fn():
        prs = near_dup_cosine(_emb(sf_dir), tau=0.45, dtype=np.float64)
        return prs.map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"]}),
            batch_format="pyarrow")

    return _cluster_assign(_emb(sf_dir), "vec_id", pairs_fn, sf_dir, "_dupe")


def _q_doc_simhash_pairs(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import simhash_pairs

    return _i64(simhash_pairs(_docs(sf_dir), max_hamming=3).to_pandas())


def _emb(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.functions.io import read_parquet_sized

    return read_parquet_sized(os.path.join(sf_dir, "embeddings.parquet"))


def _q_ann_top3(sf_dir: str):
    from pagerank_barrierfree_openmp_dynamic_ray.stages.similarity import topk_cosine

    emb = _emb(sf_dir)
    qdf = (
        emb.to_pandas().query("vec_id < 5").sort_values("vec_id").reset_index(drop=True)
    )
    queries = np.vstack(qdf["embedding"].to_numpy()).astype(np.float64)
    got = topk_cosine(emb, queries, k=3, dtype=np.float64).to_pandas()
    got["qid"] = qdf["vec_id"].to_numpy()[got["qid"].to_numpy()]
    got = got.sort_values(["qid", "score"], ascending=[True, False])
    got["rnk"] = got.groupby("qid").cumcount() + 1
    return _i64(got[["qid", "vec_id", "rnk"]].reset_index(drop=True))


def _ann_queries(sf_dir: str):
    emb = _emb(sf_dir)
    qdf = (
        emb.to_pandas().query("vec_id < 5").sort_values("vec_id").reset_index(drop=True)
    )
    return emb, np.vstack(qdf["embedding"].to_numpy()).astype(np.float64)


def _ann_recall_df(sf_dir: str, got, min_hits: int):
    """(qid, n_results, recall_ok) for an approximate-ANN result vs the
    engine's exact float64 brute-force top-3 (the same kernel the hash-green
    ``ann_top3`` query runs, so the reference set is itself SQL-verified).
    ``recall_ok = |approx ∩ exact| >= min_hits`` — thresholded because the
    probed-bucket subsets make full recall corpus-dependent; the thresholds
    sit at the measured-stable floor over repeated runs at sf0.01 (LSH
    n_hits per qid = {1,2,3,3,2}, IVF = 3 for all five, each constant
    across 6 runs)."""
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.similarity import (
        topk_cosine,
    )

    emb, queries = _ann_queries(sf_dir)
    exact = topk_cosine(emb, queries, k=3, dtype=np.float64).to_pandas()
    exact_sets = {int(q): set(g["vec_id"]) for q, g in exact.groupby("qid")}
    rows = []
    for q, g in got.to_pandas().groupby("qid"):
        hits = len(set(g["vec_id"]) & exact_sets[int(q)])
        rows.append((int(q), len(g), int(hits >= min_hits)))
    df = pd.DataFrame(rows, columns=["qid", "n_results", "recall_ok"])
    return _i64(df.sort_values("qid").reset_index(drop=True))


def _q_ann_lsh_top3(sf_dir: str):
    """LSH-bucketed ANN, SQL-checked via the recall invariant: 3 results per
    query and recall@3 >= 1/3 vs the exact top-3 (bits=5, multiprobe=2
    probes half the 32 buckets; measured stable n_hits = {1,2,3,3,2})."""
    from pagerank_barrierfree_openmp_dynamic_ray.stages.similarity import lsh_topk

    emb, queries = _ann_queries(sf_dir)
    got = lsh_topk(emb, queries.astype(np.float32), k=3, bits=5, multiprobe=2)
    return _ann_recall_df(sf_dir, got, min_hits=1)


def _q_lp_labels(sf_dir: str):
    return _labels_df(sf_dir, "label_propagation", "label")


def _q_doc_ngram_jaccard(sf_dir: str):
    """Exact word-3-shingle Jaccard pairs (doc_id < 100, j >= 0.02).  The
    engine scores hashed shingles; the SQL twin scores the shingle strings —
    identical set sizes absent 64-bit collisions, so identical doubles.
    Docs with <3 tokens are excluded on BOTH sides (the engine pads them to
    a synthetic shingle the SQL twin cannot express)."""
    import re

    import pyarrow.compute as pc

    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import (
        ngram_jaccard_pairs,
    )

    tok_re = re.compile(r"\S+")

    def head(batch: pa.Table) -> pa.Table:
        ntok = np.array(
            [len(tok_re.findall(t)) for t in batch["text"].to_pylist()]
        )
        m = pc.and_(
            pc.less(batch["doc_id"], 100), pa.array(ntok >= 3)
        )
        return batch.filter(m)

    sub = _docs(sf_dir).map_batches(head, batch_format="pyarrow")
    df = ngram_jaccard_pairs(sub, threshold=0.02).to_pandas()
    df["jaccard"] = np.round(df["jaccard"], 9)
    return _i64(df)


def _q_emb_near_dup(sf_dir: str):
    """Embedding-cosine near-dup pair SET at tau=0.45 (float64 kernel; the
    margin to the threshold is >5e-4 on this corpus, so the pair set is
    precision-robust and SQL-checkable)."""
    from pagerank_barrierfree_openmp_dynamic_ray.stages.similarity import (
        near_dup_cosine,
    )

    df = near_dup_cosine(_emb(sf_dir), tau=0.45, dtype=np.float64).to_pandas()
    return _i64(df[["a", "b"]])


def _q_rev_by_nation(sf_dir: str):
    """Broadcast-join showcase: lineitem ⋈ orders ⋈ customer ⋈ nation with
    every dimension side shipped once via ray.put, then a partial-aggregate
    map_batches before the final small groupby.  Revenue is summed in integer
    cents (floor(x*100+0.5)) so Ray and DuckDB agree bit-for-bit."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import broadcast_join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = rd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    j = broadcast_join(li, orders, "l_orderkey", "o_orderkey", ["o_custkey"])
    j = broadcast_join(j, cust, "o_custkey", "c_custkey", ["c_nationkey"])
    j = broadcast_join(j, nation, "c_nationkey", "n_nationkey", ["n_name"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ext * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {"n_name": batch["n_name"].to_numpy(zero_copy_only=False), "c": cents}
        )
        g = df.groupby("n_name", sort=False).agg(
            part_rev=("c", "sum"), part_n=("c", "size")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("part_rev", alias_name="revenue_cents"),
            Sum("part_n", alias_name="n_items"),
        )
    )
    return _i64(out.to_pandas())


def _q_mm_image_stats(sf_dir: str):
    """Multimodal plumbing: binary image payloads -> actor-pool decode ->
    resize geometry.  Deterministic synthetic payloads (the codec boundary is
    the documented stub — see stages/multimodal.py)."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.multimodal import (
        ResizeStage,
        decode_images,
        make_image_payload,
    )

    n = 64
    items = pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(
                [make_image_payload(32 + (i % 5) * 16, 24 + (i % 7) * 16, i)
                 for i in range(n)],
                pa.binary(),
            ),
        }
    )
    ds = rd.from_arrow(items).repartition(4)
    out = decode_images(ds, concurrency=2, batch_size=16).map_batches(
        ResizeStage, batch_format="pyarrow", batch_size=16, concurrency=2
    )
    df = out.to_pandas()
    df["mean_pixel"] = np.round(df["mean_pixel"], 9)
    return _i64(df.sort_values("item_id").reset_index(drop=True))


def _q_mm_audio_stats(sf_dir: str):
    """Audio plumbing: AUD! payloads -> actor-pool decode ->
    (sample_rate, duration_s, rms) typed metadata."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.multimodal import (
        decode_audio,
        make_audio_payload,
    )

    n = 32
    items = pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(
                [make_audio_payload(8000 * (1 + i % 3), 4000 * (1 + i % 5), i)
                 for i in range(n)],
                pa.binary(),
            ),
        }
    )
    df = decode_audio(rd.from_arrow(items).repartition(4)).to_pandas()
    df["rms"] = np.round(df["rms"], 9)
    df["duration_s"] = np.round(df["duration_s"], 9)
    return _i64(df.sort_values("item_id").reset_index(drop=True))


def _q_mm_frames(sf_dir: str):
    """Video frame-sampling plumbing: VID! payloads -> every 4th frame's
    feature row (one row per sampled frame — flat_map-shaped output)."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.multimodal import (
        make_video_payload,
        sample_frames,
    )

    n = 32
    items = pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(
                [make_video_payload(8 + (i % 4) * 4, 64, i) for i in range(n)],
                pa.binary(),
            ),
        }
    )
    df = sample_frames(rd.from_arrow(items).repartition(4), stride=4).to_pandas()
    df["mean_value"] = np.round(df["mean_value"], 9)
    return _i64(df.sort_values(["item_id", "frame"]).reset_index(drop=True))


def _q_ann_ivf_top3(sf_dir: str):
    """IVF-bucketed ANN (distributed k-means codebook, nprobe=4 of 8
    centroid buckets probed), SQL-checked via the recall invariant: 3
    results per query and recall@3 >= 2/3 vs the exact top-3 (measured
    stable at 3/3 for all five queries; threshold leaves margin)."""
    from pagerank_barrierfree_openmp_dynamic_ray.stages.similarity import ivf_topk

    emb, queries = _ann_queries(sf_dir)
    got = ivf_topk(emb, queries.astype(np.float32), k=3, n_centroids=8, nprobe=4)
    return _ann_recall_df(sf_dir, got, min_hits=2)


def _q_events_window(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # microseconds
        hour = ts // 3_600_000_000
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        import pandas as pd

        df = pd.DataFrame({"event_type": et, "hour": hour, "value": val})
        g = df.groupby(["event_type", "hour"], sort=False).agg(
            n_part=("value", "size"), mn=("value", "min"), mx=("value", "max")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Min("mn", alias_name="min_value"),
            Max("mx", alias_name="max_value"),
        )
    )
    return _i64(out.to_pandas())


def _q_events_sliding(sf_dir: str):
    """Sliding-window aggregate: trailing 3-hour moving average of hourly
    event counts per type (missing hours are real zeros, SQL RANGE-frame
    semantics; stages/windows.py)."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.windows import (
        sliding_hourly_mean,
    )

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )
    df = sliding_hourly_mean(ev, window=3).to_pandas()
    # no rounding: the sparse integer-cumsum roll is bit-identical to the
    # SQL RANGE frame (one double division on exact integer sums)
    return _i64(df)


def _q_events_sessions(sf_dir: str):
    """Gap-timeout sessionization (30-minute silence starts a new session):
    one row per (user, session) with start/end/event-count
    (`stages/windows.py::sessionize` — one hash(user)%P part groupby,
    vectorized lexsort + gap cumsum inside the part).  DuckDB twin is the
    textbook LAG-gap-flag window chain; session assignment is
    order-independent among equal timestamps so no tie-break is needed."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.windows import sessionize

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    df = sessionize(ev, key="user_id", ts="ts", gap_s=1800.0,
                    num_partitions=16).to_pandas()
    return _i64(df.sort_values(["user_id", "session_idx"])
                .reset_index(drop=True))


def _q_doc_top_by_lang(sf_dir: str):
    """Per-key top-k: each language's 3 largest documents by n_chars
    (`stages/ranking.py::top_k_per_key` — per-batch keep-k combiner, one
    hash(key)%P shuffle of at most k rows per key per batch).  DuckDB twin
    is ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.ranking import (
        top_k_per_key,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "n_chars"])
    out = top_k_per_key(docs, key="lang", order_col="n_chars", k=3,
                        tie_col="doc_id", num_partitions=16).to_pandas()
    return _i64(out.sort_values(["lang", "n_chars", "doc_id"],
                                ascending=[True, False, True])
                .reset_index(drop=True))


def _q_doc_sample(sf_dir: str):
    """Deterministic hash sampling: ~5% of documents chosen by value hash of
    doc_id (`stages/sampling.py::hash_sample` — a stateless vectorized
    filter, membership is a pure function of the key so reruns and retries
    pick the identical sample).  DuckDB twin reproduces the uint64
    multiplicative hash with HUGEINT arithmetic — full value-hash check."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.sampling import (
        hash_sample,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "n_chars"])
    df = hash_sample(docs, "doc_id", rate_ppm=50_000).to_pandas()
    return _i64(df.sort_values("doc_id").reset_index(drop=True))


def _q_events_asof(sf_dir: str):
    """As-of (backward) join — view->click attribution: every click gets
    the same user's latest view at-or-before it (null when none).  Runs the
    distributed plan of ``stages/joins.py::asof_join`` (right side
    hash-split into object-store partitions, one part groupby on the left,
    composite-key searchsorted probe); DuckDB twin is a native ASOF LEFT
    JOIN."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import asof_join

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"])
    views = ev.filter(expr="event_type == 'view'").select_columns(
        ["user_id", "ts", "value"])
    # canonicalize ties: the engine's pick among duplicate (user_id, ts)
    # view rows is stable-last while DuckDB's ASOF pick is unspecified —
    # MAX(value) per (user_id, ts) on BOTH sides makes the oracle
    # deterministic regardless of corpus duplicates.  Per-batch Arrow
    # partial max + one hash(user)%P part groupby (never a per-key groupby).
    P = np.uint64(16)

    def part_max(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["user_id", "ts"]).aggregate([("value", "max")])
        k = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("part", pa.array((k % P).astype(np.int32)))

    def final_max(group: pa.Table) -> pa.Table:
        t = group.group_by(["user_id", "ts"]).aggregate([("value_max", "max")])
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "value": t["value_max_max"]})

    views = (views.map_batches(part_max, batch_format="pyarrow")
             .groupby("part").map_groups(final_max, batch_format="pyarrow"))
    out = asof_join(clicks, views, key="user_id", ts="ts", take=["value"],
                    num_partitions=16)
    df = out.to_pandas()[["event_id", "user_id", "value_asof"]]
    df = df.rename(columns={"value_asof": "last_view_value"})
    return _i64(df.sort_values("event_id").reset_index(drop=True))


def _q_events_range(sf_dir: str):
    """Time-range join — error triage: every error event paired with the
    same user's clicks in the trailing hour (``stages/joins.py::range_join``;
    DuckDB twin is a plain BETWEEN-predicate join)."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import range_join

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    errors = ev.filter(expr="event_type == 'error'").select_columns(
        ["event_id", "user_id", "ts"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"]).rename_columns(
        {"event_id": "click_id", "ts": "click_ts"})
    out = range_join(errors, clicks, key="user_id", left_ts="ts",
                     right_ts="click_ts", lower_us=-3_600_000_000, upper_us=0,
                     take=["click_id"], num_partitions=16)
    df = out.to_pandas()[["event_id", "click_id_r"]]
    df = df.rename(columns={"click_id_r": "click_id"})
    return _i64(df.sort_values(["event_id", "click_id"]).reset_index(drop=True))


def _q_events_distinct_users(sf_dir: str):
    """Exact distinct-user count per event type (`stages/dedup.py::
    distinct_count`): per-batch distinct-pair combiner, one
    hash(user)%P shuffle, vectorized per-part distinct+count, tiny final
    sum — never a per-value groupby, never a collected value set."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import (
        distinct_count,
    )

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])
    return _i64(distinct_count(ev, "event_type", "user_id"))


def _q_events_hll_users(sf_dir: str):
    """Approximate distinct-user count per event type via the mergeable
    HyperLogLog sketch (`stages/dedup.py::hll_distinct`, p=12), SQL-checked
    by the invariant pattern: the exact count comes from the hash-green
    `distinct_count` operator and `within_tol` asserts the sketch lands
    within 5% relative error (3x its ~1.6% standard error at p=12; measured
    <2.7% on 150..2M uniform cardinalities).  The sketch ships O(groups *
    2^p) register rows total — constant communication regardless of input
    rows, the 100-TB path when even one row per distinct value is too much
    shuffle."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.dedup import (
        distinct_count,
        hll_distinct,
    )

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])
    approx = hll_distinct(ev, "event_type", "user_id", p=12)
    exact = distinct_count(ev, "event_type", "user_id")
    df = exact.merge(approx, on="event_type")
    rel = (df["n_approx"] - df["n_distinct"]).abs() / df["n_distinct"]
    df["within_tol"] = (rel <= 0.05).astype("int64")
    return _i64(df[["event_type", "n_distinct", "within_tol"]])


def _q_li_pruned_agg(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity"],
    )
    out = li.groupby("l_returnflag").aggregate(
        Count(alias_name="n_rows"), Sum("l_quantity", alias_name="sum_qty")
    )
    return _i64(out.to_pandas())


def _q_oli_hash_join(sf_dir: str):
    """Big-x-big shuffle equi-join (`stages/relational.py::hash_join`):
    lineitem ⋈ orders with NEITHER side broadcast — orders is hash-split
    into object-store partitions, lineitem co-locates via one key%P part
    groupby, the resolve expands multiplicity by vectorized searchsorted
    bounds.  Revenue in integer cents so Ray and DuckDB agree bit-for-bit."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.relational import (
        hash_join,
    )

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    j = hash_join(li, orders, "l_orderkey", "o_orderkey",
                  take=["o_orderpriority"], suffix="", num_partitions=16)

    def partial(batch: pa.Table) -> pa.Table:
        ext = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ext * (1 - disc) * 100 + 0.5).astype(np.int64)
        t = pa.table({"o_orderpriority": batch["o_orderpriority"],
                      "cents": pa.array(cents)})
        g = t.group_by(["o_orderpriority"]).aggregate(
            [("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_orderpriority", "cents", "n"])

    df = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = df.groupby("o_orderpriority", as_index=False).agg(
        revenue_cents=("cents", "sum"), n_items=("n", "sum"))
    return _i64(out.sort_values("o_orderpriority").reset_index(drop=True))


def _q_orders_semi(sf_dir: str):
    """Bloom-prefiltered semi-join (`stages/relational.py::semi_join`):
    orders having at least one near-full-quantity lineitem.  The Bloom
    filter over the selective right side drops definite non-members inside
    the left scan BEFORE the shuffle; survivors get the exact searchsorted
    verdict, so the result is exact (DuckDB twin: WHERE EXISTS)."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.relational import (
        semi_join,
    )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    big = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    ).filter(expr="l_quantity > 49").select_columns(["l_orderkey"])
    sj = semi_join(orders, big, "o_orderkey", "l_orderkey",
                   num_partitions=16, bloom_bits=1 << 20)

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table({"o_orderpriority": batch["o_orderpriority"],
                      "cents": pa.array(cents)})
        g = t.group_by(["o_orderpriority"]).aggregate(
            [("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_orderpriority", "cents", "n"])

    df = sj.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = df.groupby("o_orderpriority", as_index=False).agg(
        total_cents=("cents", "sum"), n_orders=("n", "sum"))
    return _i64(out.sort_values("o_orderpriority").reset_index(drop=True))


def _q_orders_anti(sf_dir: str):
    """Anti-join (`stages/relational.py::anti_join`): orders with NO
    discounted lineitem (DuckDB twin: WHERE NOT EXISTS).  Same shuffle
    plan as the semi-join minus the Bloom cut — an anti-join's output IS
    the non-members, which must flow regardless."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.relational import (
        anti_join,
    )

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus"],
    )
    disc = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_discount"],
    ).filter(expr="l_discount >= 0.05").select_columns(["l_orderkey"])
    aj = anti_join(orders, disc, "o_orderkey", "l_orderkey",
                   num_partitions=16)
    df = aj.select_columns(["o_orderstatus"]).to_pandas()
    out = df.groupby("o_orderstatus", as_index=False).size().rename(
        columns={"size": "n_orders"})
    return _i64(out.sort_values("o_orderstatus").reset_index(drop=True))


def _q_events_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles (`stages/quantiles.py`): one
    hash(group)%P part shuffle, one vectorized sort per partition serving
    every group and quantile; the selected element is
    ``sorted[ceil(q*n)-1]`` — bit-identical to DuckDB quantile_disc."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.quantiles import (
        grouped_quantiles,
    )

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value"])
    out = grouped_quantiles(ev, "event_type", "value",
                            {"p50": 0.5, "p90": 0.9, "p99": 0.99},
                            num_partitions=8)
    return _i64(out.to_pandas().sort_values("event_type")
                .reset_index(drop=True))


def _q_doc_tfidf_top3(sf_dir: str):
    """Per-document top-3 tf-idf terms (`functions/tfidf.py`): Arrow-
    vectorized tokenize/explode, df via one hash(term)%P part groupby,
    df->tf attach via the term-hash lookup join, per-doc ranking via one
    hash(doc)%P part groupby.  Score is the integer tf * ((1000*N) // df)
    (milli-quantized idf) so ranking is float-free on both sides."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.functions.tfidf import (
        tfidf_top_terms,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    out = tfidf_top_terms(docs, k=3, num_partitions=16)
    return _i64(out.to_pandas().sort_values(["doc_id", "rank"])
                .reset_index(drop=True))


def _q_doc_chunks(sf_dir: str):
    """Training-prep chunking (`functions/chunk.py`): overlapping 400-char
    windows at stride 300, codepoint-exact vs SQL substring; shuffle-free
    flat expansion.  Returns per-chunk rows (doc_id, chunk_id, chunk_text)."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.functions.chunk import (
        chunk_documents,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    out = chunk_documents(docs, width=400, stride=300)
    return _i64(out.to_pandas().sort_values(["doc_id", "chunk_id"])
                .reset_index(drop=True))


# flagship corpus constants: 1000 seeded pages yield exactly 988 distinct
# linked urls (vertices) — asserted in the query so corpus drift fails loudly
# on the engine side before the twin can mismatch
_PAGES_N = 1000
_PAGES_V = 988
_PAGES_DIR = os.path.join(tempfile.gettempdir(), "graft_flagship", "pages")


def _q_pages_flagship(sf_dir: str):
    """Flagship web pipeline: synthetic corpus -> extract -> graph ->
    static PageRank -> top 20.  SQL-checked end to end: the twin
    (sqltwins.pages_pagerank_sql) re-extracts the anchors from the SAME
    corpus parquet with regexp_extract_all, reassigns sorted-url vids, and
    runs the unrolled sweep — hash equality covers extraction, vid
    assignment, graph build, and the rank values at 12 decimals."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.pagerank import (
        PageRankEngine,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.sources.pages import (
        ensure_pages_parquet,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.stages.graph_build import (
        build_graph_from_pages,
    )

    root = os.path.dirname(_PAGES_DIR)
    pages_dir = ensure_pages_parquet(_PAGES_DIR, _PAGES_N)
    lay = build_graph_from_pages(
        rd.read_parquet(pages_dir), os.path.join(root, "graph"), num_partitions=4
    )
    assert lay.n_vertices == _PAGES_V, (
        f"flagship corpus drifted: {lay.n_vertices} vertices != {_PAGES_V}"
    )
    eng = PageRankEngine(lay, num_cpus_per_actor=0.25)
    res = eng.run(mode="barrier")
    eng.shutdown()
    top = _top20_df(res.ranks)
    # vid -> url reverse lookup from the layout's vertex table
    verts = rd.read_parquet(os.path.join(root, "graph", "vertices")).to_pandas()
    url_of = verts.set_index("vid")["url"]
    top.insert(0, "url", top["vid"].map(url_of).astype(str))
    return top


def _q_pages_host_graph(sf_dir: str):
    """Host-level contraction of the flagship page graph
    (`functions/extract.py::host_link_counts`): top-20 (src_host, dst_host)
    pairs by anchor count — the crawl-politeness / domain-ranking aggregate.
    Twin: sqltwins.pages_host_graph_sql over the same deterministic corpus."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.functions.extract import (
        extract_links,
        host_link_counts,
    )
    from pagerank_barrierfree_openmp_dynamic_ray.sources.pages import (
        ensure_pages_parquet,
    )

    pages_dir = ensure_pages_parquet(_PAGES_DIR, _PAGES_N)
    links = extract_links(rd.read_parquet(pages_dir, columns=["url", "html"]))
    df = host_link_counts(links, num_partitions=8).to_pandas()
    df = df.sort_values(["n_links", "src_host", "dst_host"],
                        ascending=[False, True, True]).head(20)
    return _i64(df.reset_index(drop=True))


def _ensure_flagship_corpus() -> str:
    """Materialize the deterministic flagship corpus (pure pyarrow, no Ray)
    so the pages twin can read it regardless of execution order."""
    from pagerank_barrierfree_openmp_dynamic_ray.sources.pages import (
        ensure_pages_parquet,
    )

    return ensure_pages_parquet(_PAGES_DIR, _PAGES_N)


def entry() -> Any:
    """Flagship pipeline smoke on /root/testdata/sf0.001."""
    return _q_pr_top20("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # graph operators (SQL-checked)
        "lg_degree": _q_lg_degree,
        "lg_counts": _q_lg_counts,
        "lg_selfloops": _q_lg_selfloops,
        "mtx_roundtrip": _q_mtx_roundtrip,
        "lg_top_indegree": _q_lg_top_indegree,
        "lg_wdegree": _q_lg_wdegree,
        "lg_triangles": _q_lg_triangles,
        # iterative graph algorithms (deterministic ones — incl. hot-split —
        # SQL-checked via unrolled sweep twins; async ones via invariant
        # twins: stable top-20 vid set + engine-side fixed-point agreement)
        "pr_top20": _q_pr_top20,
        "pr_barrierfree_top20": _q_pr_barrierfree_top20,
        "pr_dynamic_frontier_top20": _q_pr_dynamic_frontier_top20,
        "pr_hot_split_top20": _q_pr_hot_split_top20,
        "pr_dead_top20": _q_pr_dead_top20,
        "pr_weighted_top20": _q_pr_weighted_top20,
        "cc_components": _q_cc_components,
        "lp_labels": _q_lp_labels,
        "pages_flagship": _q_pages_flagship,
        # text analysis (SQL-checked)
        "doc_token_counts": _q_doc_token_counts,
        "doc_token_freq": _q_doc_token_freq,
        "doc_quality": _q_doc_quality,
        "doc_lang_id": _q_doc_lang_id,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_redact": _q_doc_redact,
        "doc_repetition": _q_doc_repetition,
        "doc_decontam": _q_doc_decontam,
        "doc_exact_dedup": _q_doc_exact_dedup,
        "doc_dedup_kept": _q_doc_dedup_kept,
        # near-dup family (simhash/minhash SQL-checked; ngram SQL-checked)
        "doc_minhash_pairs": _q_doc_minhash_pairs,
        "doc_dup_clusters": _q_doc_dup_clusters,
        "doc_leak_split": _q_doc_leak_split,
        "doc_simhash_pairs": _q_doc_simhash_pairs,
        "doc_ngram_jaccard": _q_doc_ngram_jaccard,
        # similarity search
        "ann_top3": _q_ann_top3,
        "ann_lsh_top3": _q_ann_lsh_top3,
        "ann_ivf_top3": _q_ann_ivf_top3,
        "emb_near_dup": _q_emb_near_dup,
        "emb_dup_clusters": _q_emb_dup_clusters,
        # multimodal plumbing (SQL-checked: deterministic payload pattern)
        "mm_image_stats": _q_mm_image_stats,
        "mm_audio_stats": _q_mm_audio_stats,
        "mm_frames": _q_mm_frames,
        # joins + stream-shaped + pruned-read aggregates (SQL-checked)
        "rev_by_nation": _q_rev_by_nation,
        "events_window": _q_events_window,
        "events_sliding": _q_events_sliding,
        "events_sessions": _q_events_sessions,
        "doc_top_by_lang": _q_doc_top_by_lang,
        "doc_sample": _q_doc_sample,
        "events_asof": _q_events_asof,
        "events_range": _q_events_range,
        "events_distinct_users": _q_events_distinct_users,
        "events_hll_users": _q_events_hll_users,
        "li_pruned_agg": _q_li_pruned_agg,
        # relational shuffle joins + distribution/text-prep operators
        "oli_hash_join": _q_oli_hash_join,
        "orders_semi": _q_orders_semi,
        "orders_anti": _q_orders_anti,
        "events_quantiles": _q_events_quantiles,
        "doc_tfidf_top3": _q_doc_tfidf_top3,
        "doc_chunks": _q_doc_chunks,
        "pages_host_graph": _q_pages_host_graph,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "lg_degree": _FULL_E
        + "SELECT src AS vid, COUNT(*) AS deg FROM full_e GROUP BY src",
        "lg_counts": _FULL_E
        + f"SELECT {V}::BIGINT AS n_vertices, (SELECT COUNT(*) FROM full_e) AS n_edges",
        "lg_selfloops": f"SELECT COUNT(*) AS n_selfloops FROM ({_E}) WHERE src = dst",
        # the mtx round trip is SQL-checkable: both written and read-back
        # edge counts must equal the dedup+self-loop graph's edge count
        "mtx_roundtrip": _FULL_E
        + f"SELECT {V}::BIGINT AS n_vertices, "
        "(SELECT COUNT(*) FROM full_e) AS n_edges_written, "
        "(SELECT COUNT(*) FROM full_e) AS n_edges_read",
        "lg_top_indegree": _FULL_E
        + "SELECT dst AS vid, COUNT(*) AS indeg FROM full_e GROUP BY dst "
        "ORDER BY indeg DESC, vid LIMIT 20",
        "lg_wdegree": f"""
WITH raw AS ({_WEIGHTED_E}),
     e AS (SELECT src, dst, SUM(w) AS w FROM raw WHERE src <> dst
           GROUP BY src, dst),
     loops AS (SELECT x.range::BIGINT AS v FROM range({V}) x),
     full_e AS (SELECT src, dst, w FROM e
                UNION ALL SELECT v, v, 1 FROM loops)
SELECT src AS vid, CAST(SUM(w) AS BIGINT) AS deg FROM full_e GROUP BY src
""",
        "lg_triangles": f"""
WITH raw AS ({_E}),
     und AS (SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
             FROM raw WHERE src <> dst),
     deg AS (SELECT v, COUNT(*) AS c
             FROM (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
             GROUP BY v),
     orient AS (
       SELECT CASE WHEN (d1.c, u.lo) < (d2.c, u.hi) THEN u.lo ELSE u.hi END AS s,
              CASE WHEN (d1.c, u.lo) < (d2.c, u.hi) THEN u.hi ELSE u.lo END AS t
       FROM und u JOIN deg d1 ON d1.v = u.lo JOIN deg d2 ON d2.v = u.hi)
SELECT COUNT(*) AS triangles
FROM orient a JOIN orient b ON b.s = a.t JOIN orient c ON c.s = a.s AND c.t = b.t
""",
        "doc_token_counts": f"SELECT doc_id, len({_TOK}) AS n_tokens, "
        f"len({_PIECES}) AS n_pieces FROM documents",
        "doc_token_freq": f"""
WITH tok AS (SELECT unnest({_TOK}) AS value FROM documents)
SELECT value, COUNT(*) AS n FROM tok GROUP BY value
HAVING COUNT(*) >= CEIL(0.001 * (SELECT COUNT(*) FROM tok))
ORDER BY n DESC, value
""",
        "doc_quality": f"""
SELECT doc_id,
       length(text) AS n_chars_m,
       len({_TOK}) AS n_tokens,
       CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         / GREATEST(len({_TOK}), 1) AS mean_tok_len,
       CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
         / GREATEST(length(text), 1) AS punct_ratio,
       CAST(len(list_filter({_TOK}, x -> x IN {_STOP})) AS DOUBLE)
         / GREATEST(len({_TOK}), 1) AS stop_ratio,
       len({_TOK}) >= 10
         AND CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
             / GREATEST(len({_TOK}), 1) >= 2
         AND CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
             / GREATEST(len({_TOK}), 1) <= 12
         AND CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
             / GREATEST(length(text), 1) < 0.2 AS quality_pass
FROM documents
""",
        "doc_lang_id": """
WITH s AS (
  SELECT doc_id,
         regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk,
         len(list_filter(regexp_extract_all(lower(text), '\\S+'),
             x -> x IN ('the','and','of','is'))) AS en,
         len(list_filter(regexp_extract_all(lower(text), '\\S+'),
             x -> x IN ('der','die','und','das'))) AS de,
         len(list_filter(regexp_extract_all(lower(text), '\\S+'),
             x -> x IN ('le','la','et','les'))) AS fr,
         len(list_filter(regexp_extract_all(lower(text), '\\S+'),
             x -> x IN ('el','los','y','las'))) AS es
  FROM documents)
SELECT doc_id,
       CASE WHEN cjk THEN 'zh'
            WHEN GREATEST(en, de, fr, es) = 0 THEN 'und'
            WHEN en = GREATEST(en, de, fr, es) THEN 'en'
            WHEN de = GREATEST(en, de, fr, es) THEN 'de'
            WHEN fr = GREATEST(en, de, fr, es) THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM s
""",
        "doc_fingerprint": "SELECT doc_id, md5(text) AS md5 FROM documents",
        "doc_redact": f"""
WITH pii AS (
  SELECT doc_id,
         text || ' u' || doc_id || '@ex' || (doc_id % 7)
              || '.org ip 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
           AS text
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_IPV4_RE}'))::BIGINT AS n_ips,
       md5(regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_IPV4_RE}', '<IP>', 'g')) AS redacted_md5
FROM pii
""",
        "doc_repetition": """
WITH lined AS (SELECT doc_id, replace(text, ' ', chr(10)) AS text
               FROM documents),
     ln AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
            FROM lined),
     s AS (SELECT doc_id, COUNT(*) AS n_lines,
                  COUNT(DISTINCT line) AS n_distinct
           FROM ln WHERE length(line) > 0 GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(s.n_lines, 0)::BIGINT AS n_lines,
       COALESCE(s.n_lines - s.n_distinct, 0)::BIGINT AS n_dup_lines,
       COALESCE(s.n_lines - s.n_distinct, 0)::DOUBLE
         / GREATEST(COALESCE(s.n_lines, 0), 1) AS dup_line_frac
FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
""",
        "doc_decontam": r"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tok
           FROM documents),
     el AS (SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tok) - 1),
                      i -> tok[i] || chr(1) || tok[i+1] || chr(1) || tok[i+2]))
                     AS s
            FROM t WHERE len(tok) >= 3),
     bench AS (SELECT DISTINCT unnest(s) AS g FROM el WHERE doc_id % 31 = 0),
     tr AS (SELECT doc_id, unnest(s) AS g FROM el WHERE doc_id % 31 <> 0),
     hit AS (SELECT doc_id, COUNT(*) AS n_hit
             FROM tr JOIN bench USING (g) GROUP BY doc_id)
SELECT e.doc_id,
       len(e.s)::BIGINT AS n_shingles,
       COALESCE(h.n_hit, 0)::BIGINT AS n_contaminated,
       COALESCE(h.n_hit, 0)::DOUBLE / GREATEST(len(e.s), 1)
         AS contamination_frac
FROM el e LEFT JOIN hit h USING (doc_id)
WHERE e.doc_id % 31 <> 0
""",
        "doc_exact_dedup": "SELECT md5(text) AS md5, MIN(doc_id) AS keep_id, "
        "COUNT(*) AS n_copies FROM documents GROUP BY md5(text)",
        "doc_dedup_kept": "SELECT MIN(doc_id) AS doc_id FROM documents "
        "GROUP BY md5(text)",
        "ann_top3": """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5)
SELECT qid, e.vec_id,
       row_number() OVER (PARTITION BY qid
                          ORDER BY list_cosine_similarity(qe, e.embedding) DESC,
                                   e.vec_id) AS rnk
FROM q, embeddings e
QUALIFY rnk <= 3
""",
        "doc_ngram_jaccard": r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tok
  FROM documents
  WHERE doc_id < 100 AND len(regexp_extract_all(text, '\S+')) >= 3
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tok) - 1),
            i -> tok[i] || chr(1) || tok[i+1] || chr(1) || tok[i+2])) AS s
  FROM t
)
SELECT a.doc_id AS a, b.doc_id AS b,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 9) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.02
""",
        # single source of truth with the emb_dup_clusters closure twin —
        # a tau/cast tweak can never diverge the pair set from its clusters
        "emb_near_dup": sqltwins.EMB_NEAR_DUP_PAIRS_SQL,
        "rev_by_nation": """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON o_orderkey  = l_orderkey
JOIN customer ON c_custkey   = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
GROUP BY n_name
""",
        "events_window": """
SELECT event_type,
       date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', ts) AS hour,
       COUNT(*) AS n_events,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY event_type, hour
""",
        # gap-timeout sessionization: LAG gap flag -> running sum = session
        # id -> per-session aggregate.  Order-independent among equal ts
        # (diff 0 never exceeds the gap; RANGE framing gives peers one sid)
        "events_sessions": """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM o
)
SELECT user_id, sid::BIGINT AS session_idx, MIN(ts) AS session_start,
       MAX(ts) AS session_end, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid ORDER BY user_id, session_idx
""",
        "doc_top_by_lang": """
SELECT doc_id, lang, n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id) <= 3
ORDER BY lang, n_chars DESC, doc_id
""",
        # hash_sample twin: HUGEINT arithmetic reproduces the engine's
        # uint64 multiplicative hash bit-for-bit (stages/sampling.py)
        "doc_sample": "SELECT doc_id, lang, n_chars FROM documents WHERE "
        "(((doc_id::HUGEINT * 2654435761) % 18446744073709551616 "
        "+ 18446744073709551616) % 18446744073709551616) % 1000000 < 50000 "
        "ORDER BY doc_id",
        "events_sliding": """
WITH c AS (
  SELECT event_type,
         date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', ts) AS hour,
         COUNT(*) AS n_events
  FROM events GROUP BY event_type, hour
)
SELECT event_type, hour, n_events,
       CAST(SUM(n_events) OVER w AS DOUBLE)
         / LEAST(3, hour - MIN(hour) OVER (PARTITION BY event_type) + 1)
         AS moving_avg
FROM c
WINDOW w AS (PARTITION BY event_type ORDER BY hour
             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
        "events_range": """
WITH errors AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'error'),
     clicks AS (SELECT event_id AS click_id, user_id, ts AS click_ts
                FROM events WHERE event_type = 'click')
SELECT e.event_id, c.click_id
FROM errors e JOIN clicks c
  ON e.user_id = c.user_id
 AND c.click_ts BETWEEN e.ts - INTERVAL 60 MINUTE AND e.ts
ORDER BY e.event_id, c.click_id
""",
        "events_asof": """
WITH clicks AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'),
     views AS (SELECT user_id, ts, MAX(value) AS value FROM events
               WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id, v.value AS last_view_value
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.event_id
""",
        "events_distinct_users": "SELECT event_type, COUNT(DISTINCT user_id)"
        " AS n_distinct FROM events GROUP BY event_type ORDER BY event_type",
        # HLL sketch invariant twin: exact count is fully hash-checked, and
        # within_tol = 1 asserts the sketch estimate is within 5% of it
        # (3x the p=12 standard error; see _q_events_hll_users)
        "events_hll_users": "SELECT event_type, COUNT(DISTINCT user_id)"
        " AS n_distinct, 1::BIGINT AS within_tol FROM events"
        " GROUP BY event_type ORDER BY event_type",
        "li_pruned_agg": "SELECT l_returnflag, COUNT(*) AS n_rows, "
        "SUM(l_quantity) AS sum_qty FROM lineitem GROUP BY l_returnflag",
        "oli_hash_join": """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
        "orders_semi": """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents,
       COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
GROUP BY o_orderpriority
""",
        "orders_anti": """
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount >= 0.05)
GROUP BY o_orderstatus
""",
        "events_quantiles": """
SELECT event_type,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.9)  AS p90,
       quantile_disc(value, 0.99) AS p99
FROM events
GROUP BY event_type
""",
        "doc_tfidf_top3": """
WITH toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
    FROM documents) u
  WHERE term <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ((1000 * n.n) // df.df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3
""",
        "doc_chunks": """
WITH idx AS (
  SELECT doc_id, text,
         unnest(generate_series(0, length(text) // 300)) AS chunk_id
  FROM documents)
SELECT doc_id, chunk_id,
       substring(text, CAST(chunk_id * 300 + 1 AS BIGINT), 400) AS chunk_text
FROM idx
WHERE chunk_id * 300 < length(text)
""",
        # ---- iterative twins (unrolled sweep chains; functions/sqltwins) ----
        # PageRank stops at the first sweep with L-inf < 1e-10 — the twin
        # reproduces the stopping RULE, so the unroll count only needs to
        # exceed the stop sweep (43 at sf0.01; 80 = ~2x headroom)
        "pr_top20": sqltwins.pagerank_sql(_E, V, 80),
        # hot-split re-partitions the pull sum but reduces partials in a
        # fixed slot order -> bit-identical trajectory, same twin applies
        "pr_hot_split_top20": sqltwins.pagerank_sql(_E, V, 80),
        "pr_dead_top20": sqltwins.pagerank_sql(_E, V, 80, dead=True),
        "pr_weighted_top20": sqltwins.pagerank_sql(_WEIGHTED_E, V, 80,
                                                   weighted=True),
        # CC is monotone (any unroll >= convergence is exact; engine needs 32
        # sweeps at sf0.01); LP unrolls exactly the engine's max_iter
        "cc_components": sqltwins.cc_sql(_E, V, 64),
        "lp_labels": sqltwins.lp_sql(_E, V, 20),
        # exact brute-force pair twins (simhash banding is COMPLETE for
        # hamming < bands; minhash banded recall asserted 1.0 on this corpus)
        "doc_simhash_pairs": sqltwins.simhash_sql(3),
        "doc_minhash_pairs": sqltwins.minhash_pairs_sql(0.5),
        "doc_dup_clusters": sqltwins.dup_clusters_sql(0.5),
        "emb_dup_clusters": sqltwins.emb_dup_clusters_sql(),
        "doc_leak_split": sqltwins.leak_split_sql(0.5, 100_000),
        # deterministic payload regeneration (stages/multimodal._pattern)
        "mm_image_stats": sqltwins.mm_image_sql(),
        "mm_audio_stats": sqltwins.mm_audio_sql(),
        "mm_frames": sqltwins.mm_frames_sql(),
        # ---- invariant twins for the async/approximate surfaces ----
        # async PageRank: top-20 vid set must equal the SQL fixpoint's and
        # the engine asserts |async - sync| < 1e-6 per vid (see
        # _async_top20_within for the measured margins)
        "pr_barrierfree_top20": sqltwins.pagerank_vids_sql(_E, V, 80),
        # the frontier twin reads the updated graph the query dumps (the
        # query always rewrites the dump before returning, and the driver
        # runs the Ray pipeline before its oracle)
        "pr_dynamic_frontier_top20": sqltwins.pagerank_vids_sql(
            f"SELECT src, dst FROM read_parquet('{_FRONTIER_DUMP}/*.parquet')",
            V, 80),
        # approximate-ANN recall invariants vs the exact top-3 (ann_top3's
        # hash-green kernel); thresholds at the measured-stable floor
        "ann_lsh_top3": "SELECT vec_id AS qid, 3::BIGINT AS n_results, "
        "1::BIGINT AS recall_ok FROM embeddings WHERE vec_id < 5 "
        "ORDER BY qid",
        "ann_ivf_top3": "SELECT vec_id AS qid, 3::BIGINT AS n_results, "
        "1::BIGINT AS recall_ok FROM embeddings WHERE vec_id < 5 "
        "ORDER BY qid",
        # full flagship twin: extraction + vid assignment + unrolled
        # PageRank over the same corpus parquet (ensured without Ray, so
        # query/oracle execution order cannot matter)
        "pages_flagship": sqltwins.pages_pagerank_sql(
            os.path.join(
                _ensure_flagship_corpus(), "*.parquet"), _PAGES_V, 70),
        "pages_host_graph": sqltwins.pages_host_graph_sql(
            os.path.join(_ensure_flagship_corpus(), "*.parquet")),
    }
