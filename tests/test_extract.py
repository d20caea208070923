"""Ingest tests: corpus determinism, extraction byte-identity, link parity."""

import numpy as np
import pyarrow as pa
import pytest

from pagerank_barrierfree_openmp_dynamic_ray.functions.extract import (
    extract_links,
    extract_links_batch,
    extract_text_bytes,
    extract_texts,
)
from pagerank_barrierfree_openmp_dynamic_ray.sources.pages import (
    pages_table,
    page_url,
)


def test_generator_deterministic_and_chunk_independent():
    a = pages_table(0, 50, 1000)
    b = pa.concat_tables([pages_table(0, 20, 1000), pages_table(20, 50, 1000)])
    assert a.equals(b)


def test_text_extraction_byte_identity_small():
    t = pages_table(0, 200, 1000)
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text_bytes(html) == text.encode()


def test_degree_skew_and_links_in_range():
    t = pages_table(0, 500, 1000)
    e = extract_links_batch(t)
    assert e.num_rows > 0
    # every dst is a valid page url of the corpus
    urls = {page_url(k) for k in range(1000)}
    assert set(e["dst_url"].to_pylist()) <= urls


def test_extraction_on_dataset(ray_session, pages_1k):
    import ray.data as rd

    pages = rd.read_parquet(pages_1k)
    # byte-identity over the whole corpus, computed distributed
    got = extract_texts(pages).to_pandas().set_index("url")["text"]
    want = pages.select_columns(["url", "text"]).to_pandas().set_index("url")["text"]
    assert got.sort_index().equals(want.sort_index())

    edges = extract_links(pages)
    n = edges.count()
    # exact parity with the per-table extraction
    local = extract_links_batch(pages_table(0, 1000, 1000)).num_rows
    assert n == local


def test_host_link_counts_vs_duckdb(ray_session, pages_1k):
    """Host contraction matches a DuckDB regexp twin on the same corpus."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pagerank_barrierfree_openmp_dynamic_ray.functions.extract import (
        host_link_counts,
    )

    pages = rd.read_parquet(pages_1k, columns=["url", "html"])
    got = (host_link_counts(extract_links(pages), num_partitions=4)
           .to_pandas().sort_values(["src_host", "dst_host"])
           .reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH pages AS (SELECT url, decode(html) AS h
                       FROM read_parquet('{pages_1k}/*.parquet')),
        links AS (SELECT url AS src_url,
                         unnest(regexp_extract_all(h, '<a href="([^"]+)">', 1))
                             AS dst_url
                  FROM pages),
        hl AS (SELECT regexp_extract(src_url, '^https://([^/]+)/', 1)
                          AS src_host,
                      regexp_extract(dst_url, '^https://([^/]+)/', 1)
                          AS dst_host
               FROM links)
        SELECT src_host, dst_host, COUNT(*) AS n_links
        FROM hl GROUP BY src_host, dst_host
        ORDER BY src_host, dst_host""").df()
    got["n_links"] = got["n_links"].astype(exp["n_links"].dtype)
    pd.testing.assert_frame_equal(got, exp)
