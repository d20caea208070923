"""Grouped exact quantiles — the ``quantile_disc`` wide operator.

A training-data pipeline gates on distribution cut-points constantly
(quality-score p95 filters, length p50 normalization, per-language token
budgets).  This computes EXACT discrete quantiles per group in the engine's
standard shape: per-batch column prune -> ONE ``hash(group) % P`` part
groupby (never a per-key groupby, CLAUDE.md) -> one vectorized sort per
partition serving every group and every requested quantile at once.

Exactness contract: the selected element is ``sorted_values[ceil(q*n) - 1]``
— bit-identical to DuckDB's ``quantile_disc(value, q)`` (calibrated against
DuckDB 1.x; the index arithmetic is done in float64 exactly as DuckDB does,
so q*n edge cases like 0.9*10 -> 9.000000000000002 agree too).

Scale contract: a group's values must fit one resolve task (quantiles are
holistic — exactness REQUIRES co-locating each group; groups here are
categorical: event types, languages, sources).  For billions-of-distinct
groups use the sketch operators instead; for a single monster group, the
same cut-point is available approximately via ``stages.frequency``'s
sketches.  Output is one row per group with one column per quantile —
driver-scale by construction (|groups| x |qs|).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _column_hash64

__all__ = ["grouped_quantiles"]


def grouped_quantiles(ds, group_col: str, value_col: str,
                      qs: dict[str, float], num_partitions: int = 32):
    """Exact per-group discrete quantiles: ``qs`` maps output column name ->
    quantile in (0, 1], e.g. ``{"p50": 0.5, "p95": 0.95}``.  Returns a
    Dataset with columns ``(group_col, *qs)``, one row per group."""
    if not qs:
        raise ValueError("grouped_quantiles: qs must be non-empty")
    for name, q in qs.items():
        if not (0.0 < q <= 1.0):
            raise ValueError(f"grouped_quantiles: {name}={q} outside (0, 1]")
    P = np.uint64(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, value_col])
        k = _column_hash64(t[group_col], group_col, "grouped_quantiles")
        part = (k * np.uint64(2654435761)) % P
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def resolve(group: pa.Table) -> pa.Table:
        g = group[group_col].to_numpy(zero_copy_only=False)
        v = group[value_col].to_numpy(zero_copy_only=False)
        # factorize (groups may be strings); uniq is sorted ascending
        uniq, codes = np.unique(g, return_inverse=True)
        order = np.lexsort((v, codes))
        codes_s, v_s = codes[order], v[order]
        # segment boundaries per group in the (group, value)-sorted array
        starts = np.searchsorted(codes_s, np.arange(len(uniq)), side="left")
        ends = np.searchsorted(codes_s, np.arange(len(uniq)), side="right")
        n = (ends - starts).astype(np.float64)
        cols: dict = {group_col: pa.array(uniq)}
        for name, q in qs.items():
            idx = np.ceil(q * n).astype(np.int64) - 1
            idx = np.clip(idx, 0, (ends - starts) - 1)
            cols[name] = pa.array(v_s[starts + idx])
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )
