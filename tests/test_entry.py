"""Driver-contract smoke: __ray_entry__.entry/queries/oracle_sql shape.

Guards the interface the driver grades: every query key resolves, every
oracle key has a matching query, entry() returns rows with a stable schema,
and a fast sample of queries runs at sf0.001.  (The full query-vs-oracle
value comparison runs driver-side at sf0.01; tests keep to the cheap end.)
"""

import importlib
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return importlib.import_module("__ray_entry__")


# The round-5 surface the driver's correctness pass keys on.  Frozen on
# purpose: renaming or dropping a query silently orphans its recorded
# CORRECTNESS row, so any change here must be deliberate (add to this set
# alongside the new queries()/oracle_sql() entries).
FROZEN_QUERY_NAMES = frozenset("""
    ann_ivf_top3 ann_lsh_top3 ann_top3 cc_components doc_chunks doc_decontam
    doc_dedup_kept doc_dup_clusters doc_exact_dedup doc_fingerprint
    doc_lang_id doc_leak_split doc_minhash_pairs doc_ngram_jaccard
    doc_quality doc_redact doc_repetition doc_sample doc_simhash_pairs
    doc_tfidf_top3 doc_token_counts doc_token_freq doc_top_by_lang
    emb_dup_clusters emb_near_dup events_asof events_distinct_users
    events_hll_users events_quantiles events_range events_sessions
    events_sliding events_window lg_counts lg_degree lg_selfloops
    lg_top_indegree lg_triangles lg_wdegree li_pruned_agg lp_labels
    mm_audio_stats mm_frames mm_image_stats mtx_roundtrip oli_hash_join
    orders_anti orders_semi pages_flagship pages_host_graph
    pr_barrierfree_top20 pr_dead_top20 pr_dynamic_frontier_top20
    pr_hot_split_top20 pr_top20 pr_weighted_top20 rev_by_nation
""".split())


def test_contract_shape(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(qs) >= FROZEN_QUERY_NAMES, \
        f"frozen queries missing: {sorted(FROZEN_QUERY_NAMES - set(qs))}"
    assert set(qs) == FROZEN_QUERY_NAMES, \
        f"new queries not in the frozen set: {sorted(set(qs) - FROZEN_QUERY_NAMES)}"
    assert len(qs) == 57
    assert set(oracles) == set(qs), "every query carries a DuckDB twin"
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_returns_rows(entry_mod):
    out = entry_mod.entry()
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(df) > 0
    assert list(df.columns) == ["vid", "rank"]


@pytest.mark.parametrize(
    "name",
    ["lg_counts", "doc_token_counts", "doc_exact_dedup", "ann_top3",
     "events_sliding", "rev_by_nation", "mm_audio_stats"],
)
def test_fast_queries_run(entry_mod, name):
    df = entry_mod.queries()[name](SF)
    df = df if isinstance(df, pd.DataFrame) else df.to_pandas()
    assert len(df) > 0


def test_sqltwin_unroll_budget_fails_loudly():
    """An unroll budget the graph outgrows must produce an unmistakable
    sentinel row, not silently return 0 rows (pagerank) or unconverged
    labels (cc)."""
    import duckdb

    from pagerank_barrierfree_openmp_dynamic_ray.functions import sqltwins
    from pagerank_barrierfree_openmp_dynamic_ray.pipelines.derived import (
        V,
        derived_edge_sql,
    )

    con = duckdb.connect()
    con.sql("CREATE VIEW lineitem AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/lineitem.parquet')")
    E = derived_edge_sql()
    pr = con.sql(sqltwins.pagerank_sql(E, V, 3)).df()  # 3 sweeps: no stop
    assert list(pr["vid"]) == [-1] and pr["rank"].isna().all()
    cc = con.sql(sqltwins.cc_sql(E, V, 1)).df()  # 1 sweep: unconverged
    assert (cc["vid"] == -1).any()
    # adequate budgets produce NO sentinel
    ok = con.sql(sqltwins.pagerank_sql(E, V, 80)).df()
    assert (ok["vid"] >= 0).all() and len(ok) == 20


def test_async_invariant_twin_barrierfree(entry_mod):
    """The invariant-twin contract at the cheap scale: the barrier-free
    query's top-20 vid set equals the unrolled-sweep SQL fixpoint's, and
    every within_tol flag is 1 (sqltwins.pagerank_vids_sql)."""
    import duckdb

    df = entry_mod.queries()["pr_barrierfree_top20"](SF)
    assert list(df.columns) == ["vid", "within_tol"]
    assert (df["within_tol"] == 1).all()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{SF}/lineitem.parquet')")
    want = con.sql(entry_mod.oracle_sql()["pr_barrierfree_top20"]).df()
    assert list(df["vid"]) == list(want["vid"])
    assert (want["within_tol"] == 1).all()


def test_ann_recall_invariant_queries(entry_mod):
    """LSH/IVF queries return the thresholded recall invariant shape and
    hold their floors at sf0.001 as well (measured stable)."""
    for name in ("ann_lsh_top3", "ann_ivf_top3"):
        df = entry_mod.queries()[name](SF)
        assert list(df.columns) == ["qid", "n_results", "recall_ok"]
        assert list(df["qid"]) == [0, 1, 2, 3, 4]
        assert (df["n_results"] == 3).all()
        assert (df["recall_ok"] == 1).all(), name


def test_pages_flagship_matches_sql_twin(entry_mod):
    """Flagship chain vs the full extraction+vids+unrolled-PageRank twin —
    the strongest single check in the suite: hash-level equality of
    (url, vid, rank) implies extraction, vid assignment, graph build and
    rank values all agree with an independent SQL derivation."""
    import duckdb
    import pandas as pd

    got = entry_mod.queries()["pages_flagship"](SF)
    con = duckdb.connect()
    want = con.sql(entry_mod.oracle_sql()["pages_flagship"]).df()
    g = got.sort_values("vid").reset_index(drop=True)
    w = want.sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["url", "vid", "rank"]], w[["url", "vid", "rank"]],
        check_dtype=False)
