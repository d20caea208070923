"""Shuffle-scale relational operators: hash/semi/anti joins, Bloom filter,
grouped quantiles, tf-idf, chunking — each vs a pandas or DuckDB oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pagerank_barrierfree_openmp_dynamic_ray.stages.relational import (
    anti_join,
    bloom_build,
    bloom_might_contain,
    hash_join,
    semi_join,
)

SF = "/root/testdata/sf0.001"


def _mk(rows: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows))


# ---------------------------------------------------------------------------
# hash join
# ---------------------------------------------------------------------------

def test_hash_join_inner_multiplicity(ray_session):
    left = _mk({"k": [1, 1, 2, 3, 9], "lv": [10, 11, 20, 30, 90]})
    right = _mk({"k2": [1, 2, 2, 4], "rv": ["a", "b", "c", "d"]})
    got = (hash_join(left, right, "k", "k2", take=["rv"], num_partitions=3)
           .to_pandas().sort_values(["k", "lv", "rv_r"]).reset_index(drop=True))
    exp = (pd.merge(left.to_pandas(), right.to_pandas(),
                    left_on="k", right_on="k2")
           .rename(columns={"rv": "rv_r"})[["k", "lv", "rv_r"]]
           .sort_values(["k", "lv", "rv_r"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "lv", "rv_r"]], exp)


def test_hash_join_left_nulls(ray_session):
    left = _mk({"k": [1, 3, 5], "lv": [1, 3, 5]})
    right = _mk({"k": [1, 1], "rv": [7, 8]})
    got = (hash_join(left, right, "k", "k", take=["rv"], how="left",
                     num_partitions=2)
           .to_pandas().sort_values(["k", "rv_r"]).reset_index(drop=True))
    assert got["k"].tolist() == [1, 1, 3, 5]
    assert got["rv_r"].tolist()[:2] == [7, 8]
    assert got["rv_r"].isna().tolist() == [False, False, True, True]


def test_hash_join_column_collision_guard(ray_session):
    left = _mk({"k": [1], "part": [0]})
    right = _mk({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="collide"):
        hash_join(left, right, "k", "k", take=["v"])


def test_hash_join_vs_duckdb_on_testdata(ray_session):
    import ray.data as rd

    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    got = (hash_join(li, orders, "l_orderkey", "o_orderkey",
                     take=["o_orderpriority"], suffix="", num_partitions=8)
           .to_pandas()
           .sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True))
    exp = duckdb.sql(f"""
        SELECT l_orderkey, l_linenumber, o_orderpriority
        FROM read_parquet('{SF}/lineitem.parquet') li
        JOIN read_parquet('{SF}/orders.parquet') o ON o_orderkey = l_orderkey
        ORDER BY l_orderkey, l_linenumber
    """).df()
    pd.testing.assert_frame_equal(
        got[["l_orderkey", "l_linenumber", "o_orderpriority"]], exp)


# ---------------------------------------------------------------------------
# semi / anti + bloom
# ---------------------------------------------------------------------------

def test_semi_anti_partition_testdata(ray_session):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])
    disc = rd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_discount"]
    ).filter(expr="l_discount >= 0.05").select_columns(["l_orderkey"])

    semi = (semi_join(orders, disc, "o_orderkey", "l_orderkey",
                      num_partitions=4, bloom_bits=1 << 16)
            .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    anti = (anti_join(orders, disc, "o_orderkey", "l_orderkey",
                      num_partitions=4)
            .to_pandas().sort_values("o_orderkey").reset_index(drop=True))
    exp_semi = duckdb.sql(f"""
        SELECT o_orderkey, o_orderstatus
        FROM read_parquet('{SF}/orders.parquet')
        WHERE EXISTS (SELECT 1 FROM read_parquet('{SF}/lineitem.parquet')
                      WHERE l_orderkey = o_orderkey AND l_discount >= 0.05)
        ORDER BY o_orderkey""").df()
    pd.testing.assert_frame_equal(semi, exp_semi)
    # semi + anti partition the left side exactly
    n_orders = len(orders.to_pandas())
    assert len(semi) + len(anti) == n_orders
    assert not set(semi["o_orderkey"]) & set(anti["o_orderkey"])


def test_semi_join_empty_right(ray_session):
    left = _mk({"k": [1, 2, 3]})
    right = _mk({"k": pa.array([], pa.int64())})
    assert semi_join(left, right, "k", "k", num_partitions=2,
                     bloom_bits=None).count() == 0
    assert anti_join(left, right, "k", "k", num_partitions=2).count() == 3


def test_bloom_no_false_negatives(ray_session):
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**62, 5000, dtype=np.int64)
    ds = _mk({"k": members})
    ref, nb, nh = bloom_build(ds, "k", num_bits=1 << 16)
    import ray

    words = ray.get(ref)
    assert bloom_might_contain(members, words, nb, nh).all()
    # false-positive rate sane at this load factor (5k keys / 64k bits)
    probes = rng.integers(0, 2**62, 20000, dtype=np.int64)
    fresh = probes[~np.isin(probes, members)]
    fp = bloom_might_contain(fresh, words, nb, nh).mean()
    assert fp < 0.15


# ---------------------------------------------------------------------------
# grouped quantiles
# ---------------------------------------------------------------------------

def test_grouped_quantiles_vs_duckdb(ray_session):
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.quantiles import (
        grouped_quantiles,
    )

    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    got = (grouped_quantiles(ev, "event_type", "value",
                             {"p50": 0.5, "p90": 0.9, "p99": 0.99},
                             num_partitions=4)
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    exp = duckdb.sql(f"""
        SELECT event_type,
               quantile_disc(value, 0.5)  AS p50,
               quantile_disc(value, 0.9)  AS p90,
               quantile_disc(value, 0.99) AS p99
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY event_type ORDER BY event_type""").df()
    pd.testing.assert_frame_equal(got, exp)


def test_grouped_quantiles_singleton_and_edges(ray_session):
    from pagerank_barrierfree_openmp_dynamic_ray.stages.quantiles import (
        grouped_quantiles,
    )

    ds = _mk({"g": ["a", "b", "b", "b", "b"],
              "v": [5.0, 4.0, 1.0, 3.0, 2.0]})
    got = (grouped_quantiles(ds, "g", "v", {"lo": 0.25, "hi": 1.0},
                             num_partitions=2)
           .to_pandas().sort_values("g").reset_index(drop=True))
    # n=1: every quantile is the single element; n=4 q=.25 -> ceil(1)-1 = idx 0
    assert got.loc[0, "lo"] == 5.0 and got.loc[0, "hi"] == 5.0
    assert got.loc[1, "lo"] == 1.0 and got.loc[1, "hi"] == 4.0


# ---------------------------------------------------------------------------
# tf-idf
# ---------------------------------------------------------------------------

def test_tfidf_vs_duckdb(ray_session):
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.functions.tfidf import (
        tfidf_top_terms,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = (tfidf_top_terms(docs, k=3, num_partitions=4)
           .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH toks AS (
          SELECT doc_id, term FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM read_parquet('{SF}/documents.parquet')) u
          WHERE term <> ''),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
               GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
               GROUP BY term),
        n AS (SELECT COUNT(*) AS n
              FROM read_parquet('{SF}/documents.parquet')),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf * ((1000 * n.n) // df.df) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, term, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term ASC) AS rank
          FROM scored)
        SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3
        ORDER BY doc_id, rank""").df()
    got["rank"] = got["rank"].astype(exp["rank"].dtype)
    got["score"] = got["score"].astype(exp["score"].dtype)
    pd.testing.assert_frame_equal(got, exp)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

def test_chunk_documents_edges(ray_session):
    from pagerank_barrierfree_openmp_dynamic_ray.functions.chunk import (
        chunk_documents,
    )

    docs = _mk({"doc_id": [0, 1, 2, 3],
                "text": ["", "x" * 300, "y" * 301, "héllo wörld" * 40]})
    got = (chunk_documents(docs, width=400, stride=300)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    # empty doc -> 0 chunks; exactly-stride doc -> 1; stride+1 -> 2
    assert got[got.doc_id == 0].empty
    assert len(got[got.doc_id == 1]) == 1
    assert len(got[got.doc_id == 2]) == 2
    assert got[got.doc_id == 2]["chunk_text"].tolist()[1] == "y"
    # codepoint (not byte) windows on non-ASCII
    t3 = "héllo wörld" * 40
    exp3 = [t3[i * 300:i * 300 + 400]
            for i in range((len(t3) - 1) // 300 + 1)]
    assert got[got.doc_id == 3]["chunk_text"].tolist() == exp3


def test_chunk_documents_vs_duckdb(ray_session):
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.functions.chunk import (
        chunk_documents,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = (chunk_documents(docs, width=400, stride=300)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH idx AS (
          SELECT doc_id, text,
                 unnest(generate_series(0, length(text) // 300)) AS chunk_id
          FROM read_parquet('{SF}/documents.parquet'))
        SELECT doc_id, chunk_id,
               substring(text, CAST(chunk_id * 300 + 1 AS BIGINT), 400)
                   AS chunk_text
        FROM idx WHERE chunk_id * 300 < length(text)
        ORDER BY doc_id, chunk_id""").df()
    got["chunk_id"] = got["chunk_id"].astype(exp["chunk_id"].dtype)
    pd.testing.assert_frame_equal(got, exp)

# ---------------------------------------------------------------------------
# celebrity-key (hot-key) guard
# ---------------------------------------------------------------------------

def _skewed_tables(seed=3, n_right=60_000, n_keys=999):
    """Right side where key 0 holds 50% of all rows (the classic
    null-substitute celebrity); left side mixes hot, cold and missing keys."""
    rng = np.random.default_rng(seed)
    n_hot = n_right // 2
    rk = np.concatenate([
        np.zeros(n_hot, np.int64),
        rng.integers(1, n_keys, n_right - n_hot),
    ])
    rv = np.arange(n_right, dtype=np.int64)
    lk = np.concatenate([
        np.zeros(3, np.int64),                       # hot hits
        rng.integers(1, n_keys + 200, 400),          # cold hits + misses
    ])
    lv = np.arange(len(lk), dtype=np.int64)
    return lk, lv, rk, rv


def test_hash_join_hot_key_inner_matches_unguarded(ray_session):
    from pagerank_barrierfree_openmp_dynamic_ray.stages.relational import (
        _hot_counts,
    )

    lk, lv, rk, rv = _skewed_tables()
    left, right = _mk({"k": lk, "lv": lv}), _mk({"k": rk, "rv": rv})
    # the guard detects exactly the celebrity
    hot = _hot_counts(_mk({"k": rk}), "k", 5_000, 4)
    assert hot == {0: (rk == 0).sum()}
    got = (hash_join(left, right, "k", "k", take=["rv"], num_partitions=4,
                     hot_key_rows=5_000)
           .to_pandas().sort_values(["lv", "rv_r"]).reset_index(drop=True))
    exp = (hash_join(left, right, "k", "k", take=["rv"], num_partitions=4,
                     hot_key_rows=None)
           .to_pandas().sort_values(["lv", "rv_r"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # and vs pandas on the hot key alone: exactly 3 x n_hot pairs, no dups
    assert (got["k"] == 0).sum() == 3 * (rk == 0).sum()


def test_hash_join_hot_key_left_owes_no_duplicate_misses(ray_session):
    lk, lv, rk, rv = _skewed_tables(seed=5)
    left, right = _mk({"k": lk, "lv": lv}), _mk({"k": rk, "rv": rv})
    got = (hash_join(left, right, "k", "k", take=["rv"], how="left",
                     num_partitions=4, hot_key_rows=5_000).to_pandas())
    exp = pd.merge(pd.DataFrame({"k": lk, "lv": lv}),
                   pd.DataFrame({"k": rk, "rv_r": rv}),
                   on="k", how="left")
    assert len(got) == len(exp)
    # every missing-key left row appears EXACTLY once, with a null
    miss = ~np.isin(lk, rk)
    g_miss = got[got["rv_r"].isna()].sort_values("lv")
    assert g_miss["lv"].tolist() == sorted(lv[miss].tolist())


def test_semi_anti_hot_key_shortcut(ray_session):
    lk, lv, rk, _ = _skewed_tables(seed=7)
    left, right = _mk({"k": lk, "lv": lv}), _mk({"k": rk})
    semi = (semi_join(left, right, "k", "k", num_partitions=4,
                      bloom_bits=1 << 14, hot_key_rows=5_000)
            .to_pandas().sort_values("lv").reset_index(drop=True))
    anti = (anti_join(left, right, "k", "k", num_partitions=4,
                      hot_key_rows=5_000)
            .to_pandas().sort_values("lv").reset_index(drop=True))
    member = np.isin(lk, rk)
    assert semi["lv"].tolist() == sorted(lv[member].tolist())
    assert anti["lv"].tolist() == sorted(lv[~member].tolist())


def test_split_block_salted_balance(ray_session):
    """The celebrity run spreads near-evenly over its salt sub-parts (the
    'no resolve task >2x the mean' criterion at the split level)."""
    import ray

    from pagerank_barrierfree_openmp_dynamic_ray.stages.relational import (
        _split_block_salted,
    )

    n = 50_000
    k = np.concatenate([np.zeros(n // 2, np.int64),
                        np.arange(1, n // 2 + 1, dtype=np.int64)])
    tab = pa.table({"k": k, "v": np.arange(n)})
    P, S = 4, 5
    outs = ray.get(_split_block_salted.options(num_returns=P + S).remote(
        ray.put(tab), "k", P, np.array([0], np.int64),
        np.array([P], np.int64), np.array([S], np.int64), P + S, 0))
    salt_rows = [t.num_rows for t in outs[P:]]
    assert sum(salt_rows) == n // 2
    assert max(salt_rows) <= 2 * (n // 2) / S
    # cold rows land by key%P, never in a salt part
    for p in range(P):
        kk = outs[p]["k"].to_numpy()
        assert (kk % P == p).all() and (kk != 0).all()
    # union preserves the multiset
    allv = np.concatenate([t["v"].to_numpy() for t in outs])
    assert np.array_equal(np.sort(allv), np.arange(n))
