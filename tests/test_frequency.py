"""Heavy-hitters operator: exact path, Misra-Gries compressed path, the
error-bound fallback, and tokenizer parity with the SQL twin."""
import numpy as np
import pyarrow as pa
import pytest

from pagerank_barrierfree_openmp_dynamic_ray.stages import frequency


def _corpus():
    rng = np.random.default_rng(3)
    head = rng.choice([f"tok{i}" for i in range(20)], 50_000,
                      p=np.arange(20, 0, -1) / np.arange(20, 0, -1).sum())
    tail = np.array([f"rare{i}" for i in range(30_000)])
    vals = np.concatenate([head, tail])
    rng.shuffle(vals)
    return pa.table({"v": vals})


def _sql_truth(tab: pa.Table, phi: float):
    import duckdb

    con = duckdb.connect()
    con.register("t", tab)
    return con.sql(
        f"SELECT v AS value, COUNT(*) AS n FROM t GROUP BY v "
        f"HAVING COUNT(*) >= CEIL({phi} * (SELECT COUNT(*) FROM t)) "
        f"ORDER BY n DESC, value").df().astype({"n": "int64"})


def test_frequent_values_exact_matches_sql(ray_session):
    import ray.data as rd

    tab = _corpus()
    ds = rd.from_arrow(tab).repartition(16)
    for phi in (0.01, 0.001):
        got = frequency.frequent_values(ds, "v", phi, num_partitions=8)
        assert got.equals(_sql_truth(tab, phi)), phi


def test_frequent_values_mg_path_matches_sql(ray_session, caplog):
    """k=30 > per-batch heavy head: the compressed path's error bound stays
    under the threshold (no fallback) and the recount pass makes the output
    bit-identical to SQL."""
    import ray.data as rd

    tab = _corpus()
    ds = rd.from_arrow(tab).repartition(16)
    got = frequency.frequent_values(ds, "v", 0.001, k=30, num_partitions=8)
    assert "falling back" not in caplog.text
    assert got.reset_index(drop=True).equals(_sql_truth(tab, 0.001))


def test_frequent_values_fallback_is_still_exact(ray_session, caplog):
    """A k too small for the tail density trips the D >= threshold guard —
    the operator must answer exactly anyway (via the exact shuffle), never
    silently miss a hitter that was dropped in every batch."""
    import logging

    import ray.data as rd

    tab = _corpus()
    ds = rd.from_arrow(tab).repartition(16)
    with caplog.at_level(logging.WARNING):
        got = frequency.frequent_values(ds, "v", 0.001, k=4, num_partitions=8)
    assert "falling back" in caplog.text
    assert got.equals(_sql_truth(tab, 0.001))


def test_frequent_values_int_column_and_validation(ray_session):
    import ray.data as rd

    vals = np.concatenate([np.full(900, 7), np.arange(100) + 100])
    ds = rd.from_arrow(pa.table({"v": vals.astype("int64")}))
    got = frequency.frequent_values(ds, "v", 0.5)
    assert list(got["value"]) == [7] and list(got["n"]) == [900]

    with pytest.raises(ValueError, match="phi"):
        frequency.frequent_values(ds, "v", 0.0)
    with pytest.raises(ValueError, match="k"):
        frequency.frequent_values(ds, "v", 0.1, k=0)


def test_tokenize_column_matches_sql_unnest(ray_session):
    """Arrow whitespace split == DuckDB regexp_extract_all(text, '\\S+')."""
    import duckdb
    import ray.data as rd

    texts = ["a  b\tc", " lead", "trail ", "", "x\ny z", "tab\t\t tab"]
    ds = rd.from_arrow(pa.table({"text": texts}))
    got = sorted(frequency.tokenize_column(ds).to_pandas()["token"])
    con = duckdb.connect()
    want = sorted(r[0] for r in con.sql(
        "SELECT unnest(regexp_extract_all(t, '\\S+')) FROM "
        "(SELECT unnest(?) t)", params=[texts]).fetchall())
    assert got == want
