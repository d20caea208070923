"""Per-key top-k selection.

``top_k_per_key`` keeps each key's k best rows by a numeric order column —
the "best N documents per language / per domain" primitive.  The plan is
combiner-first: every batch is reduced to at most k rows PER KEY IN THE
BATCH before anything moves, then ONE ``hash(key) % P`` part groupby merges
the survivors with the same vectorized keep.  The shuffle therefore carries
O(k · keys-per-batch) rows, never the input; a celebrity key contributes at
most k rows per batch regardless of its row count.  Ties are broken by an
explicit unique column so the output is deterministic and matches the SQL
``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ord DESC, tie)`` exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _keep_top_k(batch: pa.Table, key: str, order_col: str, tie_col: str,
                k: int, descending: bool) -> pa.Table:
    """Rows of ``batch`` ranked <= k within their key, vectorized: one
    lexsort, segment-relative ranks from key-change boundaries, one take."""
    if batch.num_rows == 0:
        return batch
    kv = batch[key].to_numpy(zero_copy_only=False)
    ov = batch[order_col].to_numpy(zero_copy_only=False)
    tv = batch[tie_col].to_numpy(zero_copy_only=False)
    if kv.dtype == object:  # string keys: sort by a stable codes view
        kv = np.unique(kv.astype("U"), return_inverse=True)[1]
    order = np.lexsort((tv, -ov if descending else ov, kv))
    ks = kv[order]
    new_key = np.empty(len(ks), bool)
    new_key[0] = True
    new_key[1:] = ks[1:] != ks[:-1]
    first = np.maximum.accumulate(np.where(new_key, np.arange(len(ks)), 0))
    rank = np.arange(len(ks)) - first
    return batch.take(pa.array(np.sort(order[rank < k])))


def top_k_per_key(ds, key: str, order_col: str, k: int, tie_col: str,
                  descending: bool = True, num_partitions: int = 32):
    """Dataset of each key's top-``k`` rows by ``order_col`` (numeric),
    ties broken ascending by ``tie_col`` (must be unique per key for a
    deterministic result).  All input columns are preserved."""
    if k < 1:
        raise ValueError(f"top_k_per_key: k={k} must be >= 1")
    for c in (key, order_col, tie_col):
        if c not in ds.schema().names:
            raise ValueError(f"top_k_per_key: column {c!r} not in dataset")
    if "part" in ds.schema().names:
        raise ValueError("top_k_per_key: input may not have a 'part' column")
    P = num_partitions

    def partial(batch: pa.Table) -> pa.Table:
        from .dedup import _column_hash64

        t = _keep_top_k(batch, key, order_col, tie_col, k, descending)
        h = _column_hash64(t[key], key, "top_k_per_key")
        part = ((h * np.uint64(2654435761)) % np.uint64(P)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def final(group: pa.Table) -> pa.Table:
        t = _keep_top_k(group, key, order_col, tie_col, k, descending)
        return t.drop_columns(["part"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("part").map_groups(final, batch_format="pyarrow"))
