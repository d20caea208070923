"""Sessionization, per-key top-k, and deterministic hash sampling."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pagerank_barrierfree_openmp_dynamic_ray.stages.ranking import top_k_per_key
from pagerank_barrierfree_openmp_dynamic_ray.stages.sampling import (
    hash_sample,
    sample_sql_predicate,
)
from pagerank_barrierfree_openmp_dynamic_ray.stages.windows import sessionize


def _events(n=20_000, users=40, seed=5):
    """Random event times with genuine multi-hour silences per user."""
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, users, n)
    # bursty: mostly minute-scale gaps, occasionally multi-hour jumps
    gaps = np.where(rng.random(n) < 0.02,
                    rng.integers(2 * 3600, 48 * 3600, n),
                    rng.integers(1, 600, n)).astype(np.int64)
    ts = np.zeros(n, np.int64)
    for u in range(users):
        m = uid == u
        ts[m] = np.cumsum(gaps[m]) * 1_000_000
    return pa.table({"user_id": uid.astype("int64"),
                     "ts": pa.array(ts).cast(pa.timestamp("us"))})


def _pandas_sessions(tab: pa.Table, gap_s: float) -> pd.DataFrame:
    df = tab.to_pandas().sort_values(["user_id", "ts"])
    new = (df.groupby("user_id")["ts"].diff().dt.total_seconds() > gap_s)
    df["sid"] = new.groupby(df["user_id"]).cumsum().astype("int64")
    out = (df.groupby(["user_id", "sid"])
           .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                n_events=("ts", "size"))
           .reset_index().rename(columns={"sid": "session_idx"}))
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


def test_sessionize_matches_pandas_and_partition_invariance(ray_session):
    import ray.data as rd

    tab = _events()
    ds = rd.from_arrow(tab).repartition(16)
    want = _pandas_sessions(tab, 1800.0)
    for P in (4, 16):
        got = (sessionize(ds, gap_s=1800.0, num_partitions=P).to_pandas()
               .sort_values(["user_id", "session_idx"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
    # real sessions formed (not one per event, not one per user)
    assert len(want) > 40 and len(want) < tab.num_rows


def test_sessionize_gap_edges(ray_session):
    """Exactly-gap silences do NOT split (strictly-greater rule, matching
    the SQL twin's > comparison); one event alone is one session."""
    import ray.data as rd

    base = 1_700_000_000_000_000
    gap = 1800 * 1_000_000
    ts = [base, base + gap, base + gap + gap + 1, base + 10**12]
    tab = pa.table({"user_id": pa.array([1, 1, 1, 2], pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("us"))})
    got = (sessionize(rd.from_arrow(tab), gap_s=1800.0).to_pandas()
           .sort_values(["user_id", "session_idx"]).reset_index(drop=True))
    assert list(got["user_id"]) == [1, 1, 2]
    assert list(got["session_idx"]) == [0, 1, 0]
    assert list(got["n_events"]) == [2, 1, 1]


def test_top_k_per_key_matches_window_sql(ray_session):
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(9)
    tab = pa.table({
        "k": rng.integers(0, 50, 30_000).astype("int64"),
        "score": rng.integers(0, 1000, 30_000).astype("int64"),
        "id": np.arange(30_000, dtype="int64"),
    })
    ds = rd.from_arrow(tab).repartition(16)
    got = (top_k_per_key(ds, "k", "score", 5, "id", num_partitions=8)
           .to_pandas().sort_values(["k", "score", "id"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", tab)
    want = con.sql(
        "SELECT k, score, id FROM t QUALIFY row_number() OVER "
        "(PARTITION BY k ORDER BY score DESC, id) <= 5 "
        "ORDER BY k, score DESC, id").df().astype("int64")
    pd.testing.assert_frame_equal(got[["k", "score", "id"]], want)


def test_top_k_per_key_string_key_and_validation(ray_session):
    import ray.data as rd

    tab = pa.table({"k": ["a", "a", "a", "b"],
                    "score": pa.array([3, 1, 2, 9], pa.int64()),
                    "id": pa.array([0, 1, 2, 3], pa.int64())})
    ds = rd.from_arrow(tab)
    got = (top_k_per_key(ds, "k", "score", 2, "id").to_pandas()
           .sort_values(["k", "id"]).reset_index(drop=True))
    assert list(got["id"]) == [0, 2, 3]

    with pytest.raises(ValueError, match="k=0"):
        top_k_per_key(ds, "k", "score", 0, "id")
    with pytest.raises(ValueError, match="not in dataset"):
        top_k_per_key(ds, "missing", "score", 1, "id")
    with pytest.raises(ValueError, match="'part'"):
        top_k_per_key(ds.add_column("part", lambda b: b["id"]),
                      "k", "score", 1, "id")


def test_hash_sample_deterministic_and_sql_identical(ray_session):
    """Sample membership is a pure function of the key (rerun-identical)
    and the HUGEINT SQL predicate reproduces it bit-for-bit — including
    negative keys, where uint64 wraparound must match SQL's signed mod."""
    import duckdb
    import ray.data as rd

    ids = np.concatenate([np.arange(10_000), -np.arange(1, 500)])
    tab = pa.table({"doc_id": ids.astype("int64")})
    ds = rd.from_arrow(tab).repartition(8)
    a = sorted(hash_sample(ds, "doc_id", 100_000).to_pandas()["doc_id"])
    b = sorted(hash_sample(ds, "doc_id", 100_000).to_pandas()["doc_id"])
    assert a == b and 0 < len(a) < len(ids)
    con = duckdb.connect()
    con.register("t", tab)
    want = sorted(con.sql(
        "SELECT doc_id FROM t WHERE "
        + sample_sql_predicate("doc_id", 100_000)).df()["doc_id"])
    assert a == want

    with pytest.raises(ValueError, match="rate_ppm"):
        hash_sample(ds, "doc_id", -1)


def test_leakage_safe_split_cluster_consistent(ray_session):
    """Every member of a near-dup cluster lands on the SAME side (the whole
    point of the operator), membership is deterministic across calls, and
    unclustered ids split by their own hash."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.sampling import (
        hash_sample, leakage_safe_split)

    ids = np.arange(0, 5000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    # clusters: (10,11,12)->10, (100,4999)->100
    cids = np.array([10, 11, 12, 100, 4999], np.int64)
    labs = np.array([10, 10, 10, 100, 100], np.int64)
    out = leakage_safe_split(ds, "doc_id", cids, labs, val_ppm=200_000)
    df = out.to_pandas().set_index("doc_id")
    assert len(set(df.loc[[10, 11, 12], "split"])) == 1
    assert len(set(df.loc[[100, 4999], "split"])) == 1
    again = leakage_safe_split(ds, "doc_id", cids, labs,
                               val_ppm=200_000).to_pandas().set_index("doc_id")
    assert (df["split"] == again["split"]).all()
    # unclustered rows: split == the hash_sample membership of their OWN id
    solo = df.drop(index=[10, 11, 12, 100, 4999])
    sampled = set(hash_sample(ds, "doc_id", 200_000)
                  .to_pandas()["doc_id"]) - {10, 11, 12, 100, 4999}
    assert set(solo.index[solo["split"] == "val"]) == sampled
    # both sides non-trivially populated at this rate
    assert 500 < (df["split"] == "val").sum() < 1500
    with pytest.raises(ValueError):
        leakage_safe_split(ds, "doc_id", cids, labs, val_ppm=2_000_000)
    with pytest.raises(ValueError):
        leakage_safe_split(ds, "doc_id", cids[::-1], labs, val_ppm=1000)
