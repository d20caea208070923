"""Deterministic hash sampling.

``hash_sample`` keeps the rows whose key hashes under a rate threshold —
the reproducible subsampling primitive of a training-data pipeline (decide
membership from the VALUE, not a RNG, so reruns, retries and different
cluster shapes all pick the identical sample, and the same key is kept or
dropped consistently across tables).  It is a stateless vectorized filter:
no shuffle, no state, embarrassingly parallel at any scale.

The hash is the engine's version-stable value hash times a fixed Knuth
multiplier under uint64 wraparound — exactly reproducible in ANSI SQL via
HUGEINT arithmetic mod 2^64, so sampled outputs are value-hash checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MULT = np.uint64(2654435761)


def hash_sample(ds, col: str, rate_ppm: int):
    """Rows whose ``col`` value falls in the sampled ``rate_ppm``-per-million
    bucket: keep iff ``(hash64(value) * 2654435761 mod 2**64) % 1_000_000 <
    rate_ppm``.  All columns preserved; expected fraction rate_ppm/1e6."""
    if not 0 <= rate_ppm <= 1_000_000:
        raise ValueError(f"hash_sample: rate_ppm={rate_ppm} out of range "
                         "[0, 1000000]")

    def keep(batch: pa.Table) -> pa.Table:
        from .dedup import _column_hash64

        h = _column_hash64(batch[col], col, "hash_sample")
        with np.errstate(over="ignore"):
            bucket = (h * _MULT) % np.uint64(1_000_000)
        return batch.filter(pa.array(bucket < rate_ppm))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_sql_predicate(col: str, rate_ppm: int) -> str:
    """The DuckDB predicate equivalent to :func:`hash_sample` for an INTEGER
    column (HUGEINT arithmetic reproduces the uint64 wraparound; the double
    mod maps SQL's signed remainder onto it for negative values too)."""
    m = 18446744073709551616
    return (f"((({col}::HUGEINT * 2654435761) % {m} + {m}) % {m})"
            f" % 1000000 < {rate_ppm}")


def cluster_lookup(ids_sorted: np.ndarray, labels: np.ndarray,
                   d: np.ndarray) -> np.ndarray:
    """Map each id in ``d`` to its cluster representative via one
    searchsorted over the SORTED cluster-id array; ids absent from the
    table are their own cluster.  The shared lookup kernel of
    :func:`leakage_safe_split` and the ``*_dup_clusters`` queries."""
    cid = d.copy()
    if len(ids_sorted):
        pos = np.minimum(np.searchsorted(ids_sorted, d), len(ids_sorted) - 1)
        hit = ids_sorted[pos] == d
        cid[hit] = labels[pos[hit]]
    return cid


def leakage_safe_split(ds, id_col: str, cluster_ids, cluster_labels,
                       val_ppm: int = 100_000):
    """Assign every row a train/val ``split`` that is a pure function of its
    near-dup CLUSTER id — so near-duplicate rows can never straddle the
    boundary (the leakage-safe split of a training-data pipeline; a plain
    row-hash split leaks ~rate x dup-fraction of val into train via
    near-copies).

    ``cluster_ids`` / ``cluster_labels``: the cluster table from
    :func:`..dedup.dup_clusters` as a SORTED id array + aligned component
    representatives (the duplicated subset only — small by construction,
    broadcast once via ``ray.put``).  Rows absent from the table are their
    own cluster.  ``split = 'val'`` iff the cluster id's hash bucket (the
    :func:`hash_sample` function, SQL-reproducible) < ``val_ppm``.

    Returns a Dataset ``(id_col, cluster_id, split)`` — stateless vectorized
    map, no shuffle."""
    import ray

    if not 0 <= val_ppm <= 1_000_000:
        raise ValueError(f"leakage_safe_split: val_ppm={val_ppm} out of "
                         "range [0, 1000000]")
    ids = np.asarray(cluster_ids, np.int64)
    labels = np.asarray(cluster_labels, np.int64)
    if len(ids) != len(labels):
        raise ValueError("leakage_safe_split: cluster_ids and cluster_labels "
                         f"lengths differ ({len(ids)} vs {len(labels)})")
    if len(ids) > 1 and not (ids[1:] > ids[:-1]).all():
        raise ValueError("leakage_safe_split: cluster_ids must be sorted "
                         "strictly ascending")
    ref = ray.put((ids, labels))

    def tag(batch: pa.Table) -> pa.Table:
        ids_s, labs = ray.get(ref)
        d = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cid = cluster_lookup(ids_s, labs, d)
        with np.errstate(over="ignore"):
            bucket = (cid.astype(np.uint64) * _MULT) % np.uint64(1_000_000)
        return pa.table({
            id_col: pa.array(d),
            "cluster_id": pa.array(cid),
            "split": pa.array(
                np.where(bucket < np.uint64(val_ppm), "val", "train")),
        })

    return ds.map_batches(tag, batch_format="pyarrow")
