"""Link + text extraction from raw html (the ingest map stage).

The reference's ingest is a parallel MTX parse (``src/mtx.hxx:91-158``: chunk
lines, parse (u, v) pairs per thread).  Our engine's ingest is the web-native
equivalent: ``map_batches`` over Arrow page batches, producing an
``(src_url, dst_url)`` edge table and (for verification) the extracted text,
which must be byte-identical to the corpus ``text`` column (BASELINE.json
``input_hint`` per-row invariant).

Regexes are compiled once at module import (equivalent to per-actor state;
these stages are stateless so plain-function tasks suffice).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# anchors as emitted by sources/pages.py and common static html
_HREF_RE = re.compile(rb'<a\s+href="([^"]+)"[^>]*>')
_BODY_RE = re.compile(rb"<body>(.*?)</body>", re.S)
_TAG_RE = re.compile(rb"<[^>]+>")


def extract_text_bytes(html: bytes) -> bytes:
    """Visible text of the page body: anchor elements removed whole (tag and
    inner text), remaining tags stripped.  On the synthetic corpus this
    reproduces the ``text`` column byte-identically per url."""
    m = _BODY_RE.search(html)
    body = m.group(1) if m else html
    # drop anchor elements entirely (tag + inner text), then any leftover tags
    body = re.sub(rb"<a\s+href=\"[^\"]*\"[^>]*>.*?</a>", b"", body, flags=re.S)
    return _TAG_RE.sub(b"", body)


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> (src_url, dst_url) edge rows (one per anchor)."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    srcs: list[str] = []
    dsts: list[bytes] = []
    counts = np.empty(len(urls), dtype=np.int64)
    for i, h in enumerate(htmls):
        links = _HREF_RE.findall(h)
        counts[i] = len(links)
        dsts.extend(links)
    srcs = np.repeat(np.asarray(urls, dtype=object), counts)
    return pa.table(
        {
            "src_url": pa.array(srcs, pa.string()),
            "dst_url": pa.array([d.decode() for d in dsts], pa.string()),
        }
    )


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, text) with text extracted from html."""
    texts = [extract_text_bytes(h).decode() for h in batch["html"].to_pylist()]
    return pa.table(
        {
            "url": batch["url"],
            "text": pa.array(texts, pa.large_string()),
        }
    )


def extract_links(pages):
    """Dataset of pages -> Dataset of (src_url, dst_url)."""
    return pages.map_batches(
        extract_links_batch, batch_format="pyarrow", batch_size=2048
    )


def extract_texts(pages):
    return pages.map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=2048
    )


_HOST_RE = "^https://(?P<host>[^/]+)/"


def host_link_counts(links, num_partitions: int = 16):
    """Host-level contraction of the page graph: ``(src_host, dst_host,
    n_links)`` from an ``(src_url, dst_url)`` edge Dataset — the crawl-
    politeness / domain-ranking aggregate a web pipeline runs before any
    per-page work.  Vectorized host extraction (``pc.extract_regex``),
    per-batch partial counts, then ONE ``hash(host_pair) % P`` part groupby
    (never a per-pair groupby); the result is |hosts|^2-bounded, orders of
    magnitude smaller than the edge set."""
    import pyarrow.compute as pc

    from .hashing import stable_hash_strings

    P = np.uint64(num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        sh = pc.struct_field(
            pc.extract_regex(batch["src_url"].combine_chunks(), _HOST_RE),
            "host")
        dh = pc.struct_field(
            pc.extract_regex(batch["dst_url"].combine_chunks(), _HOST_RE),
            "host")
        g = pa.table({"src_host": sh, "dst_host": dh}).group_by(
            ["src_host", "dst_host"]).aggregate([([], "count_all")])
        g = g.rename_columns(["src_host", "dst_host", "n"])
        h = stable_hash_strings(
            pc.binary_join_element_wise(g["src_host"].combine_chunks(),
                                        g["dst_host"].combine_chunks(), "|"))
        return g.append_column("part", pa.array((h % P).astype(np.int32)))

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by(["src_host", "dst_host"]).aggregate([("n", "sum")])
        return g.rename_columns(["src_host", "dst_host", "n_links"])

    return (links.map_batches(partial, batch_format="pyarrow")
            .groupby("part").map_groups(fold, batch_format="pyarrow"))
