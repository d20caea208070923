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
