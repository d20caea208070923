"""Dense id assignment for sorted datasets (zip-with-index).

The reference remaps vertex keys through a hash map when building CSR
(``src/csr.hxx:40-51``, ``src/_algorithm.hxx:174``).  Distributed equivalent:
globally sort the key column, then assign each row ``offset(block) +
row_index_within_block``.  Ray Data has no built-in zip_with_index, so this is
one of the few places we drop below the Dataset API: we materialize the sorted
dataset, read per-block row counts from block *metadata* (no block fetch),
prefix-sum them into offsets, and attach ids with one remote task per block.
Block order of a sorted-and-materialized dataset is the sort order (range
partitioned), so ids are dense, deterministic, and globally ordered by key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
def _attach_index(block: pa.Table, offset: int, col: str) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.uint64))
    return block.append_column(col, ids)


def sorted_zip_with_index(ds, sort_key: str, id_col: str = "vid"):
    """Sort ``ds`` by ``sort_key`` and append a dense uint64 ``id_col``
    (0..n-1 in sort order).  Returns (dataset, total_count)."""
    mat = ds.sort(sort_key).materialize()
    bundles = list(mat.iter_internal_ref_bundles())
    block_refs: list = []
    counts: list[int] = []
    for b in bundles:
        for ref, meta in b.blocks:
            # skip empty blocks: sort emits them with a degenerate schema
            # that would poison downstream unions/joins
            if meta.num_rows:
                block_refs.append(ref)
                counts.append(meta.num_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    out_refs = [
        _attach_index.remote(ref, int(offsets[i]), id_col)
        for i, ref in enumerate(block_refs)
    ]
    return rd.from_arrow_refs(out_refs), int(offsets[-1])
