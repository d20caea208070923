"""Relational join operators: broadcast hash-join and as-of join.

The reference has no relational joins, but its engine-shape demands one real
join (url -> vid destination remap in the CSR build, `src/csr.hxx:40-51`);
training-data pipelines need the general operator plus the as-of
(backward-in-time) variant for log attribution.  Physical plans:

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


def _ts_int(col) -> np.ndarray:
    """Timestamp column -> int64 microseconds (plain ints pass through)."""
    a = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(a.dtype, np.datetime64):
        return a.astype("datetime64[us]").astype(np.int64)
    return a.astype(np.int64)


def _keyed_time_join(left, right, key: str, left_ts: str, right_ts: str,
                     take: list[str], num_partitions: int, what: str, probe,
                     suffix: str = ""):
    """Shared plan for the time-keyed joins (asof / range): the right side
    is hash-split ONCE into object-store partitions by ``key % P``
    (``stages.dedup.partition_side_table``); left rows are co-located by
    ONE plain ``groupby(key % P)`` (no ``Dataset.join``, no union+groupby —
    see CLAUDE.md traps); each resolve task fetches only its partition of
    the right side, sorts it by (key, ts) once, builds the composite key
    ``k * span + (ts - tmin)``, and hands ``probe`` the sorted arrays to
    implement the join semantics.  Requires ``max(key) * (ts span in us +
    2) < 2^63`` (raises ValueError) — holds for billions of keys over
    multi-year spans at microsecond resolution."""
    from .dedup import partition_side_table

    # the plan appends a 'part' routing column and '<take><suffix>' output
    # columns to the left table — a pre-existing column with either name
    # would produce duplicate Arrow fields and a wrong/failing groupby
    reserved = {"part"} | {f"{c}{suffix}" for c in take}
    clash = reserved & set(left.schema().names)
    if clash:
        raise ValueError(
            f"{what}: left columns {sorted(clash)} collide with the plan's "
            "routing/output columns — rename them first")

    P = np.uint64(num_partitions)
    side = right.select_columns([key, right_ts] + take)
    _sch = right.schema()  # Ray Data Schema: .names / .types (pyarrow)
    take_types = {c: t for c, t in zip(_sch.names, _sch.types) if c in take}
    side_parts = partition_side_table(side, key_col=key,
                                      num_partitions=num_partitions)
    left_cols = left.schema().names

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column("part", pa.array((k % P).astype(np.int32)))

    def resolve(group: pa.Table) -> pa.Table:
        import ray as _ray

        p = int(group["part"][0].as_py())
        base = group.select(left_cols)
        lk = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        lt = _ts_int(group[left_ts])
        refs = side_parts[p]
        side_t = pa.concat_tables(_ray.get(refs)) if refs else None
        if side_t is None or not side_t.num_rows:
            return probe(base, lk, lt, None, take_types)
        rk = side_t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        rt = _ts_int(side_t[right_ts])
        order = np.lexsort((rt, rk))
        rk, rt = rk[order], rt[order]
        tmin = rt.min()
        span = np.int64(rt.max() - tmin + 2)
        kmax = int(max(rk.max(), lk.max()))
        if kmax >= (2 ** 63 - 1) // int(span):
            raise ValueError(
                f"{what} composite key overflow: max key {kmax} * ts-span "
                f"{int(span)} exceeds int64")
        ck = rk * span + (rt - tmin)
        return probe(base, lk, lt, (side_t, order, rk, ck, tmin, span),
                     take_types)

    return (
        left.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )


def asof_join(left, right, key: str, ts: str, take: list[str],
              num_partitions: int = 32):
    """As-of (backward) join: attach to every left row the ``take`` columns
    of the LATEST right row with the same ``key`` and ``right.ts <=
    left.ts`` — nulls when a key has no prior right row (LEFT semantics).
    The log-attribution primitive (impression -> latest preceding view).
    Physical plan: :func:`_keyed_time_join`."""

    def probe(base, lk, lt, sideinfo, take_types):
        if sideinfo is None:
            out = base
            for c in take:  # no right rows for this partition: all-null
                out = out.append_column(
                    f"{c}_asof", pa.nulls(out.num_rows, take_types[c]))
            return out
        side_t, order, rk, ck, tmin, span = sideinfo
        rel = np.clip(lt - tmin, -1, span - 2)
        pos = np.searchsorted(ck, lk * span + rel, side="right") - 1
        starts = np.searchsorted(rk, lk, side="left")
        ok = pos >= starts  # a hit must be within the left row's own key run
        # null INDEX -> null value: arrow take preserves the column type and
        # nulls exactly (a numpy round-trip would degrade int64-with-null
        # to float64 and corrupt >2^53 values)
        idx = pa.array(order[np.where(ok, pos, 0)], mask=~ok)
        out = base
        for c in take:
            out = out.append_column(
                f"{c}_asof", side_t[c].combine_chunks().take(idx))
        return out

    return _keyed_time_join(left, right, key, ts, ts, take, num_partitions,
                            "asof_join", probe, suffix="_asof")


def range_join(left, right, key: str, left_ts: str, right_ts: str,
               lower_us: int, upper_us: int, take: list[str],
               num_partitions: int = 32):
    """Time-range join: one output row per (left, right) pair with the same
    ``key`` and ``right_ts`` in ``[left_ts + lower_us, left_ts + upper_us]``
    (bounds inclusive, microseconds; e.g. lower=-3.6e9, upper=0 joins each
    left row to the trailing hour of right rows).  Right-side ``take``
    columns are appended with an ``_r`` suffix.  Physical plan:
    :func:`_keyed_time_join`; the per-pair expansion is a vectorized
    repeat + ragged arange, never a Python loop."""

    def probe(base, lk, lt, sideinfo, take_types):
        if sideinfo is None:
            out = base.slice(0, 0)
            for c in take:
                out = out.append_column(f"{c}_r", pa.nulls(0, take_types[c]))
            return out
        side_t, order, rk, ck, tmin, span = sideinfo
        rel_lo = lt + np.int64(lower_us) - tmin
        rel_hi = lt + np.int64(upper_us) - tmin
        empty = (rel_hi < 0) | (rel_lo > span - 2)
        lo = np.searchsorted(ck, lk * span + np.clip(rel_lo, 0, span - 2),
                             side="left")
        hi = np.searchsorted(ck, lk * span + np.clip(rel_hi, 0, span - 2),
                             side="right")
        counts = np.where(empty, 0, np.maximum(hi - lo, 0))
        total = int(counts.sum())
        # ragged expansion: left row i pairs with right lo[i]..lo[i]+counts[i]
        li = np.repeat(np.arange(len(lt)), counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        ri = np.repeat(lo, counts) + offs
        out = base.take(pa.array(li))
        for c in take:
            out = out.append_column(
                f"{c}_r", side_t[c].combine_chunks().take(pa.array(order[ri])))
        return out

    return _keyed_time_join(left, right, key, left_ts, right_ts, take,
                            num_partitions, "range_join", probe, suffix="_r")
