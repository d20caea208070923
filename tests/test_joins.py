"""Broadcast hash-join operator (stages/joins.py) vs pandas merge."""

import numpy as np
import pyarrow as pa
import pytest

from pagerank_barrierfree_openmp_dynamic_ray.stages import dedup
from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import broadcast_join

SF = "/root/testdata/sf0.001"


def test_broadcast_join_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    li = rd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    got = (
        broadcast_join(li, orders, "l_orderkey", "o_orderkey", ["o_custkey"])
        .to_pandas()
        .sort_values(["l_orderkey", "l_quantity", "o_custkey"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge(
            li.to_pandas(),
            orders.to_pandas(),
            left_on="l_orderkey",
            right_on="o_orderkey",
        )[["l_orderkey", "l_quantity", "o_custkey"]]
        .sort_values(["l_orderkey", "l_quantity", "o_custkey"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_broadcast_join_raises_on_fk_miss(ray_session):
    import ray.data as rd

    left = rd.from_items([{"k": 1}, {"k": 99}])
    right = rd.from_items([{"k": 1, "v": 10}])
    with pytest.raises(Exception):
        broadcast_join(left, right, "k", "k", ["v"]).materialize()


def test_ngram_jaccard_pairs_matches_matrix(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon eta"},
        {"doc_id": 2, "text": "one two three four five six seven"},
        {"doc_id": 3, "text": "one two three four five six eight"},
        {"doc_id": 4, "text": "unrelated text entirely different words"},
    ]
    docs = rd.from_items(rows)
    got = {
        (int(r["a"]), int(r["b"])): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.1).take_all()
    }
    exp = {
        (a, b): j
        for a, b, j in dedup.ngram_jaccard_matrix(docs, shingle_k=3)
        if j >= 0.1
    }
    assert set(got) == set(exp)
    for k in exp:
        assert np.isclose(got[k], exp[k])
    assert (0, 1) in got and (2, 3) in got


def test_sliding_hourly_mean_with_gaps(ray_session):
    """Gap hours count as zero in the trailing mean (RANGE-frame semantics)."""
    import pyarrow as pa
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.windows import (
        sliding_hourly_mean,
    )

    us = 3_600_000_000  # 1h in microseconds
    rows = []
    for h, cnt in [(0, 2), (1, 4), (3, 6)]:  # hour 2 missing
        rows += [{"event_type": "a", "ts": h * us + i} for i in range(cnt)]
    ev = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r["event_type"] for r in rows]),
                "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            }
        )
    )
    df = (
        sliding_hourly_mean(ev, window=3)
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert df["hour"].tolist() == [0, 1, 3]
    assert df["n_events"].tolist() == [2, 4, 6]
    # h0: 2/1; h1: (2+4)/2; h3: (4+0+6)/3
    np.testing.assert_allclose(df["moving_avg"], [2.0, 3.0, 10 / 3])


def test_asof_join_matches_pandas_merge_asof(ray_session):
    """asof_join == pandas merge_asof(by=key, direction='backward'),
    including keys with NO prior right row (null) and keys absent from the
    right side entirely."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import asof_join

    rng = np.random.default_rng(5)
    nl, nr = 4000, 3000
    lk = rng.integers(0, 50, nl)          # key 49 never appears on the right
    lt = rng.integers(0, 10**6, nl)
    rk = rng.integers(0, 49, nr)
    rt = rng.integers(10**3, 10**6, nr)   # some left ts precede every right ts
    rv = rng.random(nr)
    left = rd.from_arrow(pa.table({
        "uid": pa.array(lk.astype(np.int64)), "ts": pa.array(lt.astype(np.int64)),
        "row": pa.array(np.arange(nl))}))
    right = rd.from_arrow(pa.table({
        "uid": pa.array(rk.astype(np.int64)), "ts": pa.array(rt.astype(np.int64)),
        "val": pa.array(rv)}))
    got = (asof_join(left, right, key="uid", ts="ts", take=["val"], num_partitions=8)
           .to_pandas().sort_values("row").reset_index(drop=True))
    import pandas as pd

    want = pd.merge_asof(
        pd.DataFrame({"uid": lk, "ts": lt, "row": np.arange(nl)}).sort_values("ts"),
        pd.DataFrame({"uid": rk, "ts": rt, "val": rv}).sort_values("ts"),
        on="ts", by="uid", direction="backward",
    ).sort_values("row").reset_index(drop=True)
    assert got["val_asof"].isna().equals(want["val"].isna())
    m = ~want["val"].isna()
    np.testing.assert_allclose(got["val_asof"][m], want["val"][m], rtol=0, atol=0)
    assert got["val_asof"].isna().any()  # the no-match paths were exercised


def test_range_join_matches_bruteforce(ray_session):
    """range_join == brute-force pair filter, including empty-window rows,
    keys absent from the right, and windows clipping both span ends."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import range_join

    rng = np.random.default_rng(9)
    nl, nr = 1500, 1200
    lk = rng.integers(0, 40, nl)
    lt = rng.integers(0, 10**6, nl)
    rk = rng.integers(0, 38, nr)
    rt = rng.integers(10**4, 9 * 10**5, nr)
    rid = np.arange(nr)
    left = rd.from_arrow(pa.table({
        "uid": pa.array(lk.astype(np.int64)), "ts": pa.array(lt.astype(np.int64)),
        "row": pa.array(np.arange(nl))}))
    right = rd.from_arrow(pa.table({
        "uid": pa.array(rk.astype(np.int64)), "rts": pa.array(rt.astype(np.int64)),
        "rid": pa.array(rid)}))
    lo, hi = -5000, 2000
    got = (range_join(left, right, key="uid", left_ts="ts", right_ts="rts",
                      lower_us=lo, upper_us=hi, take=["rid"], num_partitions=8)
           .to_pandas())
    want = set()
    for i in range(nl):
        m = (rk == lk[i]) & (rt >= lt[i] + lo) & (rt <= lt[i] + hi)
        want.update((i, int(r)) for r in rid[m])
    assert set(zip(got["row"], got["rid_r"])) == want
    assert len(got) == len(want) and len(want) > 50


def test_asof_and_range_join_empty_right_partitions(ray_session):
    """Partitions with no right-side rows: asof keeps left rows with nulls,
    range emits nothing — the (previously latent) empty branch."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import (
        asof_join,
        range_join,
    )

    left = rd.from_arrow(pa.table({"k": pa.array([0, 1, 2, 3], pa.int64()),
                                   "ts": pa.array([10] * 4, pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([0], pa.int64()),
                                    "ts": pa.array([5], pa.int64()),
                                    "v": pa.array([1.5])}))
    a = asof_join(left, right, key="k", ts="ts", take=["v"],
                  num_partitions=4).to_pandas().sort_values("k")
    assert a["v_asof"].tolist()[0] == 1.5
    assert a["v_asof"].isna().tolist() == [False, True, True, True]
    r = range_join(left, right, key="k", left_ts="ts", right_ts="ts",
                   lower_us=-10, upper_us=0, take=["v"],
                   num_partitions=4).to_pandas()
    assert len(r) == 1 and r["v_r"].iloc[0] == 1.5


def test_asof_join_preserves_int64_and_nulls(ray_session):
    """take columns keep their arrow type and nulls exactly: an int64 value
    above 2^53 survives (a numpy float64 round-trip would corrupt it) and a
    null right-side value stays null."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import asof_join

    big = 2**60 + 12345
    left = rd.from_arrow(pa.table({"k": pa.array([0, 0, 1], pa.int64()),
                                   "ts": pa.array([10, 1, 10], pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([0, 1], pa.int64()),
                                    "ts": pa.array([5, 5], pa.int64()),
                                    "v": pa.array([big, None], pa.int64())}))
    out = asof_join(left, right, key="k", ts="ts", take=["v"], num_partitions=2)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow",
                                               batch_size=None)))
    assert t.schema.field("v_asof").type == pa.int64()
    rows = {(r["k"], r["ts"]): r["v_asof"] for r in t.to_pylist()}
    assert rows[(0, 1)] is None and rows[(1, 10)] is None
    assert rows[(0, 10)] == big


def test_keyed_time_join_rejects_column_collisions(ray_session):
    """A left table already carrying 'part' or an output-suffixed column
    must be rejected up front (duplicate Arrow fields would corrupt the
    part groupby silently otherwise)."""
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.joins import (
        asof_join,
        range_join,
    )

    right = rd.from_items([{"k": 1, "ts": 3, "v": 7}])
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_items([{"k": 1, "ts": 5, "part": 0}]), right,
                  key="k", ts="ts", take=["v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_items([{"k": 1, "ts": 5, "v_asof": 0}]), right,
                  key="k", ts="ts", take=["v"])
    with pytest.raises(ValueError, match="collide"):
        range_join(rd.from_items([{"k": 1, "ts": 5, "v_r": 0}]), right,
                   key="k", left_ts="ts", right_ts="ts",
                   lower_us=-10, upper_us=0, take=["v"])


def test_sliding_mean_sparse_extreme_span(ray_session):
    """A key whose events sit decades apart must not allocate the dense
    hour range (VERDICT r03 item 8: the roll is sparse) and must keep SQL
    RANGE-frame values: isolated hours average over min(window, elapsed+1)."""
    import datetime as dt

    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.stages.windows import (
        sliding_hourly_mean,
    )

    import pyarrow as pa_

    base = dt.datetime(1975, 1, 1)
    stamps = ([base] * 4 + [base + dt.timedelta(hours=1)] * 2
              # ~50 years later: a dense roll would allocate ~4.4e5 hours
              + [base + dt.timedelta(days=18250)] * 6
              + [base + dt.timedelta(days=18250, hours=2)])
    ev = rd.from_arrow(pa_.table({
        "event_type": pa_.array(["a"] * len(stamps)),
        "ts": pa_.array(stamps, pa_.timestamp("us")),
    }))
    df = sliding_hourly_mean(ev, window=3).to_pandas()
    df = df.sort_values("hour").reset_index(drop=True)
    assert list(df["n_events"]) == [4, 2, 6, 1]
    # hour0: 4/1; hour1: (4+2)/2; far hour h: 6/3 (window saturated);
    # h+2: (6+0+1)/3
    assert list(df["moving_avg"]) == [4.0, 3.0, 2.0, 7.0 / 3.0]
