"""General equi-joins at shuffle scale: inner/left hash join, semi-join and
anti-join, plus a distributed Bloom-filter prefilter for selective semi-joins.

The reference's only join is the url->vid remap of the CSR build
(`src/csr.hxx:40-51`, served by ``stages/joins.py::broadcast_join``); a
training-data pipeline additionally needs the big-x-big shapes where NEITHER
side fits a worker heap: fact-x-fact equi-joins, membership filters
("keep documents whose host is in the crawl frontier"), and their negations
("drop orders that already have lineitems").  Physical plan — the engine's
standard lookup-join shape, never ``Dataset.join`` (its per-partition
aggregator actors deadlock small sessions, CLAUDE.md) and never a
union+groupby (4x shuffle constant, measured):

1. the RIGHT side is hash-split ONCE into ``P`` object-store partitions by
   ``key % P`` (``stages.dedup.partition_side_table``) — the driver holds
   only refs;
2. the LEFT side is co-located by ONE plain ``groupby(key % P)``;
3. each resolve task fetches only its own right partition, sorts it by key
   once, and probes with ``searchsorted`` left/right bounds — join
   multiplicity is a vectorized ragged expansion (repeat + ragged arange),
   never a Python loop.

For SELECTIVE semi-joins (few left rows survive) the optional Bloom
prefilter drops definite non-members inside the left scan BEFORE the
shuffle: the filter is built distributed (one bit-array per right block,
OR-combined by a tree of Ray tasks) and shipped once via ``ray.put`` — at
100 TB this turns an all-to-all exchange of the full left table into an
exchange of just the plausible members.  An anti-join gets no such cut
(its output IS the non-members, which must flow regardless), so the
prefilter is deliberately semi-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .dedup import partition_side_table

__all__ = [
    "hash_join", "semi_join", "anti_join", "bloom_build",
    "bloom_might_contain",
]


# ---------------------------------------------------------------------------
# Bloom filter (distributed build, broadcast probe)
# ---------------------------------------------------------------------------

_SPLITMIX_1 = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanches sequential keys before bit-slicing."""
    z = x.astype(np.uint64) + _SPLITMIX_1
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_2
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_3
    return z ^ (z >> np.uint64(31))


def _bloom_word_bit(keys: np.ndarray, num_bits: int, num_hashes: int):
    """(word_index, bit_mask) arrays for every (key, hash_i) pair — double
    hashing ``h1 + i*h2`` over the splitmix-mixed key."""
    z = _mix64(keys)
    h1 = z
    h2 = (z >> np.uint64(32)) | np.uint64(1)  # odd => full-period stride
    idx = (h1[:, None] + np.arange(num_hashes, dtype=np.uint64)[None, :] * h2[:, None]) \
        % np.uint64(num_bits)
    idx = idx.ravel()
    return (idx >> np.uint64(6)).astype(np.int64), \
        np.uint64(1) << (idx & np.uint64(63))


@ray.remote
def _bloom_block(tab: pa.Table, key_col: str, num_bits: int,
                 num_hashes: int) -> np.ndarray:
    words = np.zeros(num_bits >> 6, dtype=np.uint64)
    k = tab[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    wi, bm = _bloom_word_bit(k, num_bits, num_hashes)
    np.bitwise_or.at(words, wi, bm)
    return words


@ray.remote
def _bloom_or(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_build(ds, key_col: str, num_bits: int = 1 << 23,
                num_hashes: int = 4):
    """Distributed Bloom filter over ``ds[key_col]`` (integer keys): one
    bit-array task per block, OR-combined by a binary tree of Ray tasks —
    the driver never folds more than refs.  Returns ``(ref, num_bits,
    num_hashes)`` where ``ref`` is the object-store bit array (uint64
    words; default 1 MiB for 2^23 bits).  ``num_bits`` must be a power of
    two."""
    if num_bits & (num_bits - 1):
        raise ValueError("bloom_build: num_bits must be a power of two")
    mat = ds.materialize()
    refs = []
    for b in mat.iter_internal_ref_bundles():
        for ref, meta in b.blocks:
            if meta.num_rows:
                refs.append(_bloom_block.remote(ref, key_col, num_bits,
                                                num_hashes))
    if not refs:
        refs = [ray.put(np.zeros(num_bits >> 6, dtype=np.uint64))]
    while len(refs) > 1:
        nxt = [_bloom_or.remote(refs[i], refs[i + 1])
               for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return refs[0], num_bits, num_hashes


def bloom_might_contain(keys: np.ndarray, words: np.ndarray, num_bits: int,
                        num_hashes: int) -> np.ndarray:
    """Vectorized membership probe: False is DEFINITE non-membership."""
    wi, bm = _bloom_word_bit(keys.astype(np.uint64), num_bits, num_hashes)
    hit = (words[wi] & bm) != 0
    return hit.reshape(len(keys), num_hashes).all(axis=1)


# ---------------------------------------------------------------------------
# hash join
# ---------------------------------------------------------------------------

# right-side rows of ONE key per resolve task before the key is salted
# (equi-join analogue of stages/joins.py::HOT_KEY_ROWS' time-split)
HOT_KEY_ROWS = 200_000


def _hot_counts(side, key: str, threshold: int,
                num_partitions: int) -> dict[int, int]:
    """{key: right_row_count} for keys with >= ``threshold`` rows — per-batch
    Arrow partial counts -> ONE hash(key)%P part groupby -> vectorized
    run-length fold -> tiny driver dict (hot keys are few by definition;
    everything below threshold dies inside its partition)."""
    P = np.uint64(num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by([key]).aggregate([([], "count_all")])
        k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({key: t[key], "c": t["count_all"],
                         "part": pa.array((k % P).astype(np.int32))})

    def fold(group: pa.Table) -> pa.Table:
        k = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        c = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        starts = np.flatnonzero(np.diff(k, prepend=k[0] - 1))
        sums = np.add.reduceat(c, starts)
        m = sums >= threshold
        return pa.table({key: pa.array(k[starts][m]), "c": pa.array(sums[m])})

    out = (side.map_batches(partial, batch_format="pyarrow")
           .groupby("part").map_groups(fold, batch_format="pyarrow")
           .to_pandas())
    if key not in out.columns:  # nothing hot: empty Dataset drops the schema
        return {}
    return {int(a): int(b) for a, b in zip(out[key], out["c"])}


@ray.remote
def _split_block_salted(tab: pa.Table, key_col: str, P: int,
                        hk: np.ndarray, sub_base: np.ndarray,
                        s_arr: np.ndarray, n_parts: int, seed: int):
    """One right-side block -> ``n_parts`` sub-tables: non-hot rows split by
    key%P exactly like ``_split_block``; a hot key's rows round-robin over
    its ``S`` salt sub-parts (any even spread is correct — every left row of
    a hot key visits ALL its salt parts, so the pairing is exhaustive and,
    because the salt slices are disjoint, exactly-once)."""
    k = tab[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    i = np.searchsorted(hk, k)
    ish = (i < len(hk)) & (hk[np.minimum(i, len(hk) - 1)] == k)
    part = (k.astype(np.uint64) % np.uint64(P)).astype(np.int64)
    outs = [tab.filter(pa.array(~ish & (part == p))) for p in range(P)]
    outs += [None] * (n_parts - P)
    rows = np.flatnonzero(ish)
    if len(rows):
        j = i[rows]
        order = np.argsort(j, kind="stable")
        jo = j[order]
        starts = np.flatnonzero(np.diff(jo, prepend=jo[0] - 1))
        pos = np.arange(len(jo)) - np.repeat(
            starts, np.diff(np.append(starts, len(jo))))
        dest = sub_base[jo] + (pos + seed) % s_arr[jo]
        ro = rows[order]
        for d in np.unique(dest):
            outs[int(d)] = tab.take(pa.array(ro[dest == d]))
    for p in range(P, n_parts):
        if outs[p] is None:
            outs[p] = tab.slice(0, 0)
    return tuple(outs)


def _split_side_salted(side_mat, key_col: str, P: int, hk: np.ndarray,
                       sub_base: np.ndarray, s_arr: np.ndarray,
                       n_parts: int) -> list[list]:
    """Hot-aware :func:`partition_side_table`: per-part ref lists of length
    ``n_parts`` (the P plain key%P partitions followed by every hot key's
    salt sub-parts).  The driver holds only refs; the block index seeds the
    round-robin so tiny blocks don't pile onto salt slot 0."""
    per_part: list[list] = [[] for _ in range(n_parts)]
    seed = 0
    for b in side_mat.iter_internal_ref_bundles():
        for ref, meta in b.blocks:
            if not meta.num_rows:
                continue
            outs = _split_block_salted.options(num_returns=n_parts).remote(
                ref, key_col, P, hk, sub_base, s_arr, n_parts, seed)
            seed += 1
            for p, r in enumerate(outs):
                per_part[p].append(r)
    return per_part


def hash_join(left, right, left_on: str, right_on: str,
              take: list[str] | None = None, num_partitions: int = 32,
              how: str = "inner", suffix: str = "_r",
              bloom_bits: int | None = None,
              hot_key_rows: int | None = HOT_KEY_ROWS):
    """Big-x-big equi-join on integer keys; ``how`` in ``{"inner", "left",
    "semi", "anti"}``.  ``inner``/``left`` append the right-side ``take``
    columns with ``suffix`` (duplicate right keys expand multiplicity
    exactly like SQL); ``semi``/``anti`` return the left rows that do /
    do not have a right match (``take`` must be empty — no columns cross).

    ``bloom_bits`` (semi only): build a distributed Bloom filter over the
    right keys and drop definite non-members inside the left scan before
    the shuffle.  Exactness is unaffected — the filter only removes rows
    the resolve would drop anyway; plausible members still shuffle and get
    the exact searchsorted verdict.

    Keys must be non-null; both sides route by the same ``key % P`` hash
    (``partition_side_table``'s split), so every potential match meets in
    exactly one resolve task.

    ``hot_key_rows``: celebrity-key guard (the classic null-substitute /
    default-value key whose right-side run would otherwise land — with its
    full multiplicity expansion — in ONE resolve task).  A cheap combiner
    pass counts right rows per key; keys at or above the threshold are
    handled out-of-band: ``semi``/``anti`` short-circuit them in the left
    scan (the count pass PROVES membership, so their rows never shuffle and
    the celebrity run never ships), while ``inner``/``left`` salt-split the
    key's right rows into ``S = ceil(count/hot_key_rows)`` sub-partitions
    (capped 64) and replicate each left row of that key to all ``S`` — the
    expansion spreads evenly and each (left, right) pair still meets exactly
    once.  Salt replicas resolve with inner semantics even under
    ``how="left"`` (a hot key has right matches by definition, so no miss
    row is ever owed).  ``None`` disables the guard and the extra pass."""
    take = take or []
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"hash_join: unknown how={how!r}")
    if how in ("semi", "anti") and take:
        raise ValueError("hash_join: semi/anti joins take no right columns")
    if bloom_bits and how != "semi":
        raise ValueError(
            "hash_join: the Bloom prefilter only benefits semi joins (an "
            "anti join's output is the non-members, which must flow anyway)")

    # routing/output name collisions corrupt the Arrow groupby (ADVICE r03)
    reserved = {"part"} | {f"{c}{suffix}" for c in take}
    clash = reserved & set(left.schema().names)
    if clash:
        raise ValueError(
            f"hash_join: left columns {sorted(clash)} collide with the "
            "plan's routing/output columns — rename them first")

    P = np.uint64(num_partitions)
    left_cols = left.schema().names

    if how in ("semi", "anti"):
        side = right.select_columns([right_on])
    else:
        side = right.select_columns([right_on] + take)
    _sch = side.schema()
    take_types = {c: t for c, t in zip(_sch.names, _sch.types) if c in take}

    bloom = None
    if bloom_bits:
        side = side.materialize()
        bloom = bloom_build(side, right_on, num_bits=bloom_bits)

    # celebrity-key detection: one combiner pass over the (narrow,
    # materialized) right side; nothing hot => zero routing overhead
    hot: dict[int, int] = {}
    if hot_key_rows:
        side = side.materialize()
        hot = _hot_counts(side, right_on, hot_key_rows, num_partitions)
    hk = sub_base = s_arr = None
    pass_part = None
    n_parts = num_partitions
    if hot and how in ("semi", "anti"):
        hk = np.sort(np.fromiter(hot.keys(), np.int64, len(hot)))
        pass_part = num_partitions  # semi's proven-member pass-through id

        def drop_hot(batch: pa.Table) -> pa.Table:
            k = batch[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
            i = np.searchsorted(hk, k)
            m = (i < len(hk)) & (hk[np.minimum(i, len(hk) - 1)] == k)
            return batch.filter(pa.array(~m))

        # the celebrity runs never ship — membership is already proven
        side = side.map_batches(drop_hot, batch_format="pyarrow")
    elif hot:  # inner/left: salt-split the hot right runs
        hk = np.sort(np.fromiter(hot.keys(), np.int64, len(hot)))
        sub_base = np.empty(len(hk), np.int64)
        s_arr = np.empty(len(hk), np.int64)
        nxt = num_partitions
        for j, kh in enumerate(hk):
            s = int(min(64, -(-hot[int(kh)] // hot_key_rows)))
            sub_base[j], s_arr[j] = nxt, s
            nxt += s
        n_parts = nxt

    if sub_base is not None:
        side_parts = _split_side_salted(
            side.materialize(), right_on, num_partitions, hk, sub_base,
            s_arr, n_parts)
    else:
        side_parts = partition_side_table(side, key_col=right_on,
                                          num_partitions=num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        if bloom is not None:
            ref, nb, nh = bloom
            keep = bloom_might_contain(k, ray.get(ref), nb, nh)
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                k = k[keep]
        part = (k.astype(np.uint64) % P).astype(np.int32)
        if hk is None:
            return batch.append_column("part", pa.array(part))
        i = np.searchsorted(hk, k)
        ish = (i < len(hk)) & (hk[np.minimum(i, len(hk) - 1)] == k)
        if not ish.any():
            return batch.append_column("part", pa.array(part))
        if how == "anti":  # hot => has a match => dropped here, never ships
            keep = ~ish
            return batch.filter(pa.array(keep)).append_column(
                "part", pa.array(part[keep]))
        if how == "semi":  # hot => proven member => pass-through part
            part[ish] = pass_part
            return batch.append_column("part", pa.array(part))
        # inner/left: replicate each hot left row across its S salt parts
        cold = np.flatnonzero(~ish)
        hrows = np.flatnonzero(ish)
        j = i[hrows]
        S = s_arr[j]
        total = int(S.sum())
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(S)[:-1]]), S)
        hot_parts = (sub_base[np.repeat(j, S)] + offs).astype(np.int32)
        rows = np.concatenate([cold, np.repeat(hrows, S)])
        parts = np.concatenate([part[cold], hot_parts]).astype(np.int32)
        return batch.take(pa.array(rows)).append_column(
            "part", pa.array(parts))

    def resolve(group: pa.Table) -> pa.Table:
        import ray as _ray

        p = int(group["part"][0].as_py())
        base = group.select(left_cols)
        if pass_part is not None and p == pass_part:
            return base  # hot-key semi rows: membership proven by the count
        # a salt replica owes no miss rows (its key matches SOMEWHERE)
        eff = "inner" if (how == "left" and p >= num_partitions) else how
        refs = side_parts[p]
        side_t = pa.concat_tables(_ray.get(refs)) if refs else None
        if side_t is None or not side_t.num_rows:
            if eff == "anti":
                return base
            if eff in ("semi", "inner"):
                out = base.slice(0, 0)
            else:  # left: all rows, all-null right columns
                out = base
            for c in take:
                out = out.append_column(
                    f"{c}{suffix}", pa.nulls(out.num_rows, take_types[c]))
            return out
        rk = side_t[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(rk, kind="stable")
        rk = rk[order]
        lk = base[left_on].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(rk, lk, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        counts = hi - lo
        if eff == "semi":
            return base.filter(pa.array(counts > 0))
        if eff == "anti":
            return base.filter(pa.array(counts == 0))
        # inner/left: ragged expansion — left row i pairs with right rows
        # lo[i] .. lo[i]+counts[i]-1 in key-sorted order
        total = int(counts.sum())
        li = np.repeat(np.arange(len(lk)), counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        ri = np.repeat(lo, counts) + offs
        out = base.take(pa.array(li))
        for c in take:
            out = out.append_column(
                f"{c}{suffix}",
                side_t[c].combine_chunks().take(pa.array(order[ri])))
        if eff == "left":
            miss = base.filter(pa.array(counts == 0))
            for c in take:
                miss = miss.append_column(
                    f"{c}{suffix}", pa.nulls(miss.num_rows, take_types[c]))
            out = pa.concat_tables([out, miss])
        return out

    return (
        left.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )


def semi_join(left, right, left_on: str, right_on: str,
              num_partitions: int = 32, bloom_bits: int | None = 1 << 23,
              hot_key_rows: int | None = HOT_KEY_ROWS):
    """Left rows WITH a right match (SQL ``WHERE EXISTS``); Bloom-prefiltered
    by default — pass ``bloom_bits=None`` to disable."""
    return hash_join(left, right, left_on, right_on, [], num_partitions,
                     how="semi", bloom_bits=bloom_bits,
                     hot_key_rows=hot_key_rows)


def anti_join(left, right, left_on: str, right_on: str,
              num_partitions: int = 32,
              hot_key_rows: int | None = HOT_KEY_ROWS):
    """Left rows WITHOUT a right match (SQL ``WHERE NOT EXISTS``)."""
    return hash_join(left, right, left_on, right_on, [], num_partitions,
                     how="anti", hot_key_rows=hot_key_rows)
