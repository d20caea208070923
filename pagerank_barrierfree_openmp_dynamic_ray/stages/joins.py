"""Broadcast hash-join operators.

The reference has no relational joins, but its engine-shape demands one real
join (url -> vid destination remap in the CSR build, `src/csr.hxx:40-51`);
training-data pipelines need the general operator.  Two physical plans:

- **broadcast join** (here): the small side is put in the object store ONCE
  (``ray.put``) and every ``map_batches`` task probes it zero-shuffle.  This
  is the right plan whenever the build side fits in a worker heap (dimension
  tables, vertex dictionaries) — at 100 TB the probe side streams and never
  materializes.
- **hash join** (scale path for big-big): co-partition both sides by key hash
  (``repartition``/groupby) and join per-partition — the same shuffle shape as
  the graph build's dst-partitioning (stages/graph_build.py); used only when
  neither side is broadcastable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def broadcast_map(small, key: str, value: str):
    """(key -> value) numpy lookup arrays from a small Dataset, object-store
    shared.  Returns an ObjectRef to (sorted_keys, values_in_key_order)."""
    pdf = small.select_columns([key, value]).to_pandas()
    k = pdf[key].to_numpy()
    order = np.argsort(k, kind="stable")
    ks = k[order]
    # the probe's searchsorted returns ONE match per key: a duplicate build
    # key would silently drop join multiplicity (ADVICE r01) — refuse it
    if len(ks) > 1 and (ks[1:] == ks[:-1]).any():
        raise ValueError(
            f"broadcast_join build side has duplicate keys in {key!r}; "
            "the broadcast plan requires a key-unique build side"
        )
    return ray.put((ks, pdf[value].to_numpy()[order]))


def probe(keys: np.ndarray, ref_tuple) -> np.ndarray:
    """Vectorized inner-join probe: map ``keys`` through a broadcast map.
    Raises on misses (FK joins in this engine are total)."""
    sk, sv = ref_tuple
    idx = np.searchsorted(sk, keys)
    if (idx >= len(sk)).any() or (sk[np.minimum(idx, len(sk) - 1)] != keys).any():
        raise KeyError("broadcast probe miss: non-total foreign key")
    return sv[idx]


def broadcast_join(large, small, left_on: str, right_on: str, take: list[str]):
    """``large ⋈ small`` appending ``take`` columns from the small side.
    One broadcast per taken column; the large side streams through a single
    ``map_batches`` — no shuffle."""
    refs = {c: broadcast_map(small, right_on, c) for c in take}

    def f(batch: pa.Table) -> pa.Table:
        keys = batch[left_on].to_numpy(zero_copy_only=False)
        maps = {c: ray.get(r) for c, r in refs.items()}
        for c in take:
            batch = batch.append_column(c, pa.array(probe(keys, maps[c])))
        return batch

    return large.map_batches(f, batch_format="pyarrow")
