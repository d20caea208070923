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


# right-side rows per resolve task before a key is split by time range
HOT_KEY_ROWS = 200_000


def _hot_key_stats(side, key: str, right_ts: str, threshold: int,
                   num_partitions: int) -> dict:
    """{key: (count, tmin_us, tmax_us)} for keys with >= ``threshold`` right
    rows — per-batch Arrow partial (count, min, max) -> ONE hash(key)%P part
    groupby -> vectorized per-part fold -> tiny driver table (hot keys are
    few by definition; everything below threshold dies in its partition)."""
    P = np.uint64(num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by([key]).aggregate(
            [([], "count_all"), (right_ts, "min"), (right_ts, "max")])
        k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            key: t[key], "c": t["count_all"],
            "tmn": pa.array(_ts_int(t[f"{right_ts}_min"])),
            "tmx": pa.array(_ts_int(t[f"{right_ts}_max"])),
            "part": pa.array((k % P).astype(np.int32)),
        })

    def fold(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.select([key, "c", "tmn", "tmx"]).to_pandas()
        g = df.groupby(key, sort=False).agg(
            c=("c", "sum"), tmn=("tmn", "min"), tmx=("tmx", "max")
        ).reset_index()
        g = g[g["c"] >= threshold]
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (side.map_batches(partial, batch_format="pyarrow")
           .groupby("part").map_groups(fold, batch_format="pyarrow")
           .to_pandas())
    if key not in out.columns:  # nothing hot: empty Dataset drops the schema
        return {}
    return {int(r[key]): (int(r["c"]), int(r["tmn"]), int(r["tmx"]))
            for _, r in out.iterrows()}


def _hot_route(hot_stats: dict, target_rows: int, base: int) -> dict:
    """{key: (sub_base, interior_cuts)}: key's time axis is split into
    S = ceil(count / target) buckets (capped 64) by EVENLY SPACED interior
    cuts; bucket 0 / S-1 extend to -inf / +inf so out-of-range left rows
    route safely.  Sub-part ids start at ``base`` (after the P plain
    partitions)."""
    route = {}
    for k, (c, tmn, tmx) in sorted(hot_stats.items()):
        s = int(min(64, -(-c // target_rows)))
        if s < 2 or tmx <= tmn:
            continue  # cannot or need not split
        interior = np.linspace(tmn, tmx, s + 1)[1:-1].astype(np.int64)
        route[k] = (base, interior)
        base += s
    return route, base


def _bucket(interior: np.ndarray, x: np.ndarray) -> np.ndarray:
    return np.searchsorted(interior, x, side="right")


@ray.remote
def _split_block_hot(tab: pa.Table, key: str, right_ts: str, P: int,
                     route: dict, n_parts: int, mode: str,
                     lower_us: int, upper_us: int):
    """One right-side block -> ``n_parts`` sub-tables + carry candidates.
    Non-hot rows split by key%P exactly like ``_split_block``; a hot key's
    rows go to its time bucket (asof) or to EVERY bucket whose left-ts range
    can match them (range: window-overlap replication).  The last return
    slot is the asof carry-candidate table: this block's max-ts row per
    (hot key, bucket), tagged ``__bucket`` — the driver prefix-folds these
    into per-bucket boundary-carry rows."""
    k = tab[key].to_numpy(zero_copy_only=False).astype(np.int64)
    t = _ts_int(tab[right_ts])
    hot_keys = np.fromiter(route.keys(), dtype=np.int64, count=len(route))
    is_hot = np.isin(k, hot_keys)
    base_part = (k.astype(np.uint64) % np.uint64(P)).astype(np.int64)
    outs = [tab.filter(pa.array(~is_hot & (base_part == p)))
            for p in range(P)]
    outs += [None] * (n_parts - P)
    carry_tabs = []
    for kh, (sub_base, interior) in route.items():
        m = k == kh
        if not m.any():
            continue
        th = t[m]
        sub = tab.filter(pa.array(m))
        S = len(interior) + 1
        if mode == "asof":
            b = _bucket(interior, th)
            for s in np.unique(b):
                outs[sub_base + int(s)] = sub.filter(pa.array(b == s))
            # per-bucket max-ts row of THIS block (carry candidate)
            order = np.lexsort((th, b))
            last = order[np.flatnonzero(np.diff(b[order], append=S + 1))]
            carry_tabs.append(sub.take(pa.array(last)).append_column(
                "__bucket", pa.array(b[last].astype(np.int64))))
        else:  # range: replicate to all buckets the window can touch
            s_lo = _bucket(interior, th - np.int64(upper_us))
            s_hi = _bucket(interior, th - np.int64(lower_us))
            counts = s_hi - s_lo + 1
            rows = np.repeat(np.arange(len(th)), counts)
            offs = np.arange(int(counts.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
            buckets = np.repeat(s_lo, counts) + offs
            rep = sub.take(pa.array(rows))
            for s in np.unique(buckets):
                outs[sub_base + int(s)] = rep.filter(pa.array(buckets == s))
    for i in range(P, n_parts):
        if outs[i] is None:
            outs[i] = tab.slice(0, 0)
    carry = (pa.concat_tables(carry_tabs) if carry_tabs
             else tab.slice(0, 0).append_column(
                 "__bucket", pa.array(np.empty(0, np.int64))))
    return tuple(outs) + (carry,)


def _split_side_hot(side_mat, key: str, right_ts: str, P: int, route: dict,
                    n_parts: int, mode: str, lower_us: int, upper_us: int):
    """Hot-aware :func:`...dedup.partition_side_table`: returns per-part ref
    lists of length ``n_parts`` with asof boundary-carry rows appended to
    each hot sub-part (the latest right row BEFORE the bucket's left-ts
    range, so a bucket-local searchsorted still finds matches older than
    the bucket)."""
    per_part: list[list] = [[] for _ in range(n_parts)]
    carry_refs = []
    for b in side_mat.iter_internal_ref_bundles():
        for ref, meta in b.blocks:
            if not meta.num_rows:
                continue
            outs = _split_block_hot.options(num_returns=n_parts + 1).remote(
                ref, key, right_ts, P, route, n_parts, mode,
                lower_us, upper_us)
            for p in range(n_parts):
                per_part[p].append(outs[p])
            carry_refs.append(outs[n_parts])
    if mode == "asof" and carry_refs:
        cand = pa.concat_tables(ray.get(carry_refs))
        if cand.num_rows:
            ck = cand[key].to_numpy(zero_copy_only=False).astype(np.int64)
            cb = cand["__bucket"].to_numpy(zero_copy_only=False)
            ct = _ts_int(cand[right_ts])
            for kh, (sub_base, interior) in route.items():
                m = ck == kh
                if not m.any():
                    continue
                rows = np.flatnonzero(m)
                best = None  # latest row among buckets < s, walked in order
                for s in range(len(interior) + 1):
                    if s > 0 and best is not None:
                        per_part[sub_base + s].append(ray.put(
                            cand.take(pa.array([best])).drop(["__bucket"])))
                    here = rows[cb[rows] == s]
                    if len(here):
                        cand_best = here[np.argmax(ct[here])]
                        if best is None or ct[cand_best] >= ct[best]:
                            best = cand_best
    return per_part


def _keyed_time_join(left, right, key: str, left_ts: str, right_ts: str,
                     take: list[str], num_partitions: int, what: str, probe,
                     suffix: str = "", hot_key_rows: int | None = HOT_KEY_ROWS,
                     lower_us: int = 0, upper_us: int = 0):
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

    # celebrity-key guard: a key whose right-side history exceeds
    # ``hot_key_rows`` is sub-split by TIME RANGE into its own resolve
    # sub-partitions (asof: + boundary-carry row; range: window-overlap
    # replication), so no single resolve task holds one key's entire
    # history.  Detection is one cheap combiner pass; {} on uniform keys
    # keeps the plain key%P plan byte-identical.
    route: dict = {}
    n_parts = num_partitions
    if hot_key_rows:
        side = side.materialize()
        hot_stats = _hot_key_stats(side, key, right_ts, hot_key_rows,
                                   num_partitions)
        if hot_stats:
            route, n_parts = _hot_route(hot_stats, hot_key_rows,
                                        num_partitions)
    if route:
        side_parts = _split_side_hot(
            side, key, right_ts, num_partitions, route, n_parts,
            "asof" if what == "asof_join" else "range", lower_us, upper_us)
    else:
        side_parts = partition_side_table(side, key_col=key,
                                          num_partitions=num_partitions)
    left_cols = left.schema().names

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (k.astype(np.uint64) % P).astype(np.int64)
        if route:
            lt = _ts_int(batch[left_ts])
            for kh, (sub_base, interior) in route.items():
                m = k == kh
                if m.any():
                    part[m] = sub_base + _bucket(interior, lt[m])
        return batch.append_column("part", pa.array(part.astype(np.int32)))

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
              num_partitions: int = 32,
              hot_key_rows: int | None = HOT_KEY_ROWS):
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
                            "asof_join", probe, suffix="_asof",
                            hot_key_rows=hot_key_rows)


def range_join(left, right, key: str, left_ts: str, right_ts: str,
               lower_us: int, upper_us: int, take: list[str],
               num_partitions: int = 32,
               hot_key_rows: int | None = HOT_KEY_ROWS):
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
                            num_partitions, "range_join", probe, suffix="_r",
                            hot_key_rows=hot_key_rows,
                            lower_us=lower_us, upper_us=upper_us)
