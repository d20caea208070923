"""Frequent-values (heavy-hitters) operator.

Finds EVERY value of a column whose frequency is at least ``phi`` of the
total row count — the vocabulary/stopword/celebrity-token primitive of a
webtext training-data pipeline (reference analogue: the in-degree
concentration the hot-split layout exploits, `inc/graph.hxx` degree model).

Two communication regimes, both returning the EXACT answer:

* ``k=None`` (default): per-batch Arrow ``group_by`` combiner collapses a
  batch to its distinct values, ONE ``hash(value) % P`` shuffle co-locates
  every occurrence of a value in one partition, a vectorized per-part sum +
  local ``>= threshold`` filter emits only the winners.  Communication is
  O(sum of per-batch vocabularies) — the Zipf collapse does the work
  (a 10k-doc batch ships its vocabulary, not its tokens).

* ``k=<int>``: when even per-batch vocabularies are too much shuffle, each
  batch is compressed Misra-Gries-style to its top-``k`` counted values
  before shipping; the (k+1)-th count ``delta`` is recorded per batch, so a
  value dropped everywhere has true count < sum(delta).  Candidates =
  values whose shipped sum + sum(delta) clears the threshold (a superset of
  the true winners, Agarwal et al. 2012 mergeable-summaries bound); a
  second broadcast pass recounts ONLY the candidates exactly.  Communication
  is O(k) per batch + O(candidates), independent of vocabulary size.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_SUMMARY_PART = -1  # routing id for the per-batch (delta, dropped) rows


def _hash_part(col: pa.ChunkedArray | pa.Array, col_name: str, P: int,
               op_name: str) -> np.ndarray:
    from .dedup import _column_hash64

    v = _column_hash64(col, col_name, op_name)
    return ((v * np.uint64(2654435761)) % np.uint64(P)).astype(np.int32)


def tokenize_column(ds, text_col: str = "text", out_col: str = "token"):
    """Whitespace tokens of a text column as a one-column Dataset — the
    zero-copy Arrow twin of SQL ``unnest(regexp_extract_all(text, '\\S+'))``
    (`pc.utf8_split_whitespace` + ``list_flatten``, empties dropped; parity
    pinned in tests)."""
    import pyarrow.compute as pc

    def tok(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.utf8_split_whitespace(batch[text_col]))
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({out_col: flat})

    return ds.map_batches(tok, batch_format="pyarrow")


def frequent_values(ds, col: str, phi: float, k: int | None = None,
                    num_partitions: int = 32):
    """Exact values of ``ds[col]`` occurring in at least ``phi`` of rows.

    Returns a pandas DataFrame ``(value, n)`` with ``n >= ceil(phi * N)``,
    sorted by ``n`` descending then value — identical to the SQL
    ``GROUP BY value HAVING COUNT(*) >= CEIL(phi * N)``.
    """
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"frequent_values: phi={phi} out of range (0, 1]")
    if k is not None and k < 1:
        raise ValueError(f"frequent_values: k={k} must be >= 1")
    P = num_partitions

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([col]).group_by([col]).aggregate([([], "count_all")])
        t = t.rename_columns([col, "n"])
        delta = 0
        dropped_w = 0
        if k is not None and t.num_rows > k:
            # Misra-Gries compression: ship the top-k counted values, record
            # the (k+1)-th count as this batch's additive error bound
            n = t["n"].to_numpy()
            order = np.argsort(-n, kind="stable")
            keep = order[:k]
            delta = int(n[order[k]])
            dropped_w = int(n[order[k:]].sum())
            t = t.take(pa.array(np.sort(keep)))
        part = _hash_part(t[col], col, P, "frequent_values")
        t = t.append_column("part", pa.array(part))
        t = t.append_column("delta", pa.array(
            np.zeros(t.num_rows, np.int64)))
        if k is not None:
            # one summary row per batch carries (delta, dropped weight) so a
            # driver-side fold can bound every unshipped value's true count
            summary = pa.table({
                col: pa.array([None], t[col].type),
                "n": pa.array([dropped_w], pa.int64()),
                "part": pa.array([_SUMMARY_PART], pa.int32()),
                "delta": pa.array([delta], pa.int64()),
            })
            t = pa.concat_tables([t, summary])
        return t

    counts = ds.map_batches(partial, batch_format="pyarrow")
    if k is not None:
        # the compressed stream is re-read by two consumers (summary fold +
        # per-part candidate filter); materialize the BOUNDED intermediate
        # (<= (k+1) rows per input batch), never the input
        counts = counts.materialize()
        summary = counts.filter(expr=f"part == {_SUMMARY_PART}")
        agg = summary.sum(["n", "delta"])
        dropped_total = int(agg["sum(n)"] or 0)
        D = int(agg["sum(delta)"] or 0)
        shipped = int(counts.filter(expr=f"part != {_SUMMARY_PART}")
                      .sum("n") or 0)
        N = shipped + dropped_total
    else:
        D = 0
        N = int(counts.sum("n") or 0)
    if N == 0:
        import pandas as pd

        return pd.DataFrame({"value": pa.array([], pa.string()).to_pandas(),
                             "n": pa.array([], pa.int64()).to_pandas()})
    threshold = int(math.ceil(phi * N))
    if k is not None and D >= threshold:
        # the compression error bound swallowed the threshold: a value
        # dropped in EVERY batch (true count <= D) could be a heavy hitter
        # we never saw.  Correctness over communication: redo exact.
        # A bigger k (>= ceil(batches/phi / N) counters) avoids the retry.
        import logging

        logging.getLogger(__name__).warning(
            "frequent_values: k=%d too small (error bound D=%d >= "
            "threshold %d); falling back to the exact shuffle", k, D,
            threshold)
        return frequent_values(ds, col, phi, k=None,
                               num_partitions=num_partitions)

    def fold(group: pa.Table) -> pa.Table:
        t = group.select([col, "n"]).group_by([col]).aggregate([("n", "sum")])
        n = t["n_sum"].to_numpy()
        keep = n + D >= threshold  # exact when D == 0; superset otherwise
        return pa.table({"value": t[col].filter(pa.array(keep)),
                         "n": pa.array(n[keep], pa.int64())})

    winners = (counts.filter(expr=f"part != {_SUMMARY_PART}")
               .groupby("part").map_groups(fold, batch_format="pyarrow")
               .to_pandas())

    if k is not None and len(winners):
        # pass 2: exact recount of the (small) candidate set only
        import ray

        cand = np.sort(winners["value"].to_numpy())
        cand_ref = ray.put(cand)

        def recount(batch: pa.Table) -> pa.Table:
            c = ray.get(cand_ref)
            vals = batch[col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(c, vals)
            pos_c = np.clip(pos, 0, len(c) - 1)
            hit = c[pos_c] == vals
            cnt = np.bincount(pos_c[hit], minlength=len(c))
            return pa.table({"idx": pa.array(np.arange(len(c), dtype=np.int64)),
                             "n": pa.array(cnt.astype(np.int64))})

        sums = (ds.map_batches(recount, batch_format="pyarrow")
                .groupby("idx").sum("n").to_pandas()
                .sort_values("idx"))
        import pandas as pd

        winners = pd.DataFrame({"value": cand,
                                "n": sums["sum(n)"].to_numpy()})
        winners = winners[winners["n"] >= threshold]

    return (winners.sort_values(["n", "value"], ascending=[False, True])
            .reset_index(drop=True))
