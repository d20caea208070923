"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §1).

Schema: url: string, warc_ts: timestamp[us], html: binary, text: large_string,
lang: string.  Seeded with ``numpy.random.default_rng([seed, k])`` per page so
generation is chunk-parallel and independent of block boundaries — the same
page ``k`` always has byte-identical html/text no matter how the corpus is
sharded.  The ``text`` column is the byte-identity oracle: the extractor in
``functions/extract.py`` applied to ``html`` must reproduce it exactly.

Out-degree follows Zipf(a=1.8) clipped to [0, 64] (the skew the engine must
handle); destinations are uniform over [0, n_pages), duplicates allowed
(dedup is under test downstream).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

SEED = 42
N_SITES = 97
ZIPF_A = 1.8
MAX_DEG = 64
_VOCAB = np.array(
    [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
        "victor", "whiskey", "xray", "yankee", "zulu", "graph", "rank",
        "vertex", "edge", "crawl", "page", "link", "web", "data",
    ]
)
_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)


def page_url(k: int) -> str:
    return f"https://site{k % N_SITES}.example/p/{k}"


def _page(k: int, n_pages: int, seed: int) -> tuple[str, int, bytes, str, str]:
    """Generate one page. Returns (url, warc_ts_us, html, text, lang)."""
    rng = np.random.default_rng([seed, k])
    ntok = int(rng.integers(20, 81))
    toks = _VOCAB[rng.integers(0, len(_VOCAB), size=ntok)]
    text = f"page {k} " + " ".join(toks.tolist())
    deg = min(int(rng.zipf(ZIPF_A)) - 1, MAX_DEG)  # zipf>=1 -> deg in [0, 64]
    dsts = rng.integers(0, n_pages, size=deg)
    anchors = b"".join(
        b'<a href="' + page_url(int(d)).encode() + b'">l</a>' for d in dsts
    )
    html = (
        b"<html><head><title>p" + str(k).encode() + b"</title></head><body>"
        + text.encode()
        + anchors
        + b"</body></html>"
    )
    m = k % 20
    lang = "de" if m == 18 else ("fr" if m == 19 else "en")
    ts_us = int(
        (_EPOCH + _dt.timedelta(seconds=k) - _dt.datetime(1970, 1, 1)).total_seconds()
        * 1_000_000
    )
    return page_url(k), ts_us, html, text, lang


def pages_table(k0: int, k1: int, n_pages: int, seed: int = SEED) -> pa.Table:
    """Arrow table of pages k in [k0, k1)."""
    rows = [_page(k, n_pages, seed) for k in range(k0, k1)]
    urls, tss, htmls, texts, langs = zip(*rows) if rows else ((), (), (), (), ())
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def generate_pages(n_pages: int, seed: int = SEED, chunk: int = 4096):
    """Distributed corpus generation as a Ray Dataset.

    ``ray.data.range`` over chunk starts -> ``flat-map`` each start to its
    chunk of pages; every chunk is generated independently (per-page rng), so
    this scales out without any coordination.
    """
    import ray.data as rd

    starts = list(range(0, n_pages, chunk))
    ds = rd.from_items([{"k0": s} for s in starts])

    def make(batch: pa.Table) -> pa.Table:
        tabs = [
            pages_table(int(k0), min(int(k0) + chunk, n_pages), n_pages, seed)
            for k0 in batch["k0"].to_pylist()
        ]
        return pa.concat_tables(tabs)

    return ds.map_batches(make, batch_format="pyarrow", batch_size=1)


def write_pages(path: str, n_pages: int, seed: int = SEED) -> str:
    """Materialize a corpus to partitioned Parquet (resumable layout: one file
    per chunk of page ids)."""
    generate_pages(n_pages, seed).write_parquet(path)
    return path


def ensure_pages_parquet(path: str, n_pages: int, seed: int = SEED) -> str:
    """Materialize the corpus WITHOUT Ray (pure pyarrow, one file) if ``path``
    is missing.  Row content is identical to :func:`write_pages` (per-page rng
    is independent of sharding), so the flagship query and its DuckDB twin can
    each ensure the fixture exists regardless of which runs first."""
    import os

    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pages_table(0, n_pages, n_pages, seed),
            os.path.join(tmp, "pages.parquet"),
        )
        os.rename(tmp, path)
    return path
