"""Derived graph + query wrappers over the driver's TPC-H-ish sf tables.

The graph-engine correctness corpus is the synthetic page fixture
(sources/pages.py); for the driver's DuckDB cross-check we additionally
derive a deterministic edge table from ``lineitem`` with pure int64
arithmetic so the exact same derivation is expressible in ANSI SQL:

    src = (l_orderkey * 131 + l_linenumber) % 65521
    dst = (l_partkey * 524287 + l_suppkey) % 65521

All intermediate products stay far below 2^63 — numpy int64 and DuckDB
BIGINT agree bit-for-bit.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa

V = 65521  # prime vertex-space size

_EDGE_SQL = (
    "SELECT (l_orderkey * 131 + l_linenumber) % 65521 AS src, "
    "(l_partkey * 524287 + l_suppkey) % 65521 AS dst FROM lineitem"
)


def derived_edges(sf_dir: str):
    """lineitem -> (src, dst) uint64 Dataset (column-pruned, size-aware
    read — see functions/io.py)."""
    from ..functions.io import read_parquet_sized

    li = read_parquet_sized(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(((ok * 131 + ln) % V).astype(np.uint64)),
                "dst": pa.array(((pk * 524287 + sk) % V).astype(np.uint64)),
            }
        )

    return li.map_batches(to_edges, batch_format="pyarrow")


def derived_edge_sql() -> str:
    return _EDGE_SQL


_LAYOUT_CACHE: dict[str, object] = {}


def derived_layout(sf_dir: str, num_partitions: int = 8):
    """Built (deduped, self-looped, partitioned) layout for the derived
    graph, cached per sf_dir within the process."""
    from ..stages.graph_build import build_graph

    key = os.path.abspath(sf_dir)
    if key not in _LAYOUT_CACHE:
        out = os.path.join(
            tempfile.gettempdir(), "graft_layouts", key.strip(os.sep).replace(os.sep, "_")
        )
        _LAYOUT_CACHE[key] = build_graph(
            derived_edges(sf_dir), out, num_partitions, n_vertices=V
        )
    return _LAYOUT_CACHE[key]
