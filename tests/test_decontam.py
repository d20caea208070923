"""Benchmark decontamination (broadcast shingle-set overlap scoring)."""

import numpy as np
import pytest

from pagerank_barrierfree_openmp_dynamic_ray.stages import decontam


@pytest.fixture(scope="module")
def corpora(ray_session):
    import ray.data as rd

    bench = rd.from_items(
        [
            {"doc_id": 100, "text": "what is the capital of france"},
            {"doc_id": 101, "text": "two plus two equals four"},
        ]
    )
    train = rd.from_items(
        [
            # verbatim benchmark leak: every 3-gram is contaminated
            {"doc_id": 0, "text": "what is the capital of france"},
            # partial leak: shares the 'two plus two' / 'plus two equals'
            # ... 3-grams of bench doc 101 plus clean tail grams
            {"doc_id": 1, "text": "two plus two equals four said the teacher"},
            # clean
            {"doc_id": 2, "text": "ray data streams blocks with backpressure"},
        ]
    )
    return bench, train


def test_contamination_scores(corpora):
    bench, train = corpora
    ref = decontam.benchmark_shingles(bench)
    out = (
        decontam.contamination(train, ref)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0: 4 distinct 3-grams, all in bench
    assert out.loc[0, "n_shingles"] == 4
    assert out.loc[0, "n_contaminated"] == 4
    assert out.loc[0, "contamination_frac"] == 1.0
    # doc 1: 6 3-grams, the 3 from bench doc 101 hit
    assert out.loc[1, "n_shingles"] == 6
    assert out.loc[1, "n_contaminated"] == 3
    # doc 2: clean
    assert out.loc[2, "n_contaminated"] == 0
    assert out.loc[2, "contamination_frac"] == 0.0


def test_decontaminate_filters(corpora):
    bench, train = corpora
    ref = decontam.benchmark_shingles(bench)
    kept = decontam.decontaminate(train, ref, max_frac=0.6).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2]
    strict = decontam.decontaminate(train, ref, max_frac=0.1).to_pandas()
    assert sorted(strict["doc_id"]) == [2]


def test_benchmark_size_gate(corpora):
    bench, _ = corpora
    with pytest.raises(ValueError, match="too large"):
        decontam.benchmark_shingles(bench, max_shingles=3)


def test_matches_duckdb_string_overlap(corpora):
    """Hash-based distinct overlap equals the string-level SQL computation
    (the oracle twin's shape) on a collision-free corpus."""
    duckdb = pytest.importorskip("duckdb")
    bench, train = corpora
    con = duckdb.connect()
    con.register("bench_t", bench.to_pandas())
    con.register("train_t", train.to_pandas())
    want = con.sql(r"""
WITH eb AS (SELECT regexp_extract_all(text, '\S+') AS tok FROM bench_t),
     bg AS (SELECT DISTINCT unnest(list_transform(range(1, len(tok) - 1),
              i -> tok[i] || chr(1) || tok[i+1] || chr(1) || tok[i+2])) AS g
            FROM eb),
     et AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tok FROM train_t),
     tg AS (SELECT doc_id, unnest(list_distinct(list_transform(
              range(1, len(tok) - 1),
              i -> tok[i] || chr(1) || tok[i+1] || chr(1) || tok[i+2]))) AS g
            FROM et)
SELECT doc_id, COUNT(*) FILTER (g IN (SELECT g FROM bg)) AS n_hit
FROM tg GROUP BY doc_id ORDER BY doc_id
""").df().set_index("doc_id")
    ref = decontam.benchmark_shingles(bench)
    got = (
        decontam.contamination(train, ref)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got["n_contaminated"]) == list(want["n_hit"].astype(np.int64))
