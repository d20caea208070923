"""Deduplication family over the ``documents`` table (doc_id, text, ...):

- exact (content-hash groupby, keep smallest doc_id)
- MinHash + LSH near-dup (shingle -> minhash -> band -> bucket groupby ->
  candidate pairs -> exact-Jaccard verify)
- SimHash near-dup (64-bit signature, banded buckets, hamming verify)
- n-gram Jaccard pair scoring
- embedding-cosine near-dup (see stages/similarity.py)

Shuffle shape (the part that must hold at 100 TB): signatures are computed in
a stateful actor pool (`map_batches(cls, concurrency=...)` — permutation
params built once per actor), then exploded to (band, key, doc_id) rows and
bucketed with ONE groupby; only within-bucket pairs are verified.  Verify is
DISTRIBUTED: candidate pairs are joined against the (distributed) shingle /
signature table on each endpoint (two hash joins), so no whole-corpus store
ever materializes on the driver — the sandbox runs the exact plan a 100-TB
run would.  Degenerate (band, key) buckets (boilerplate/empty docs) are
capped at ``MAX_BUCKET`` members with a deterministic sample, bounding any
single task at O(MAX_BUCKET^2) pairs; drops are logged.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Min

logger = logging.getLogger(__name__)

# Degenerate-bucket candidate cap: a (band, key) bucket with more members
# than this contributes pairs only among a deterministic sample (near-dup
# clusters stay connected through the sampled members).
MAX_BUCKET = 256

from ..functions.hashing import (
    MinHasher,
    hamming64,
    jaccard,
    shingle_hashes,
    simhash64,
    simhash_band_keys,
)
from ..functions.textstats import fingerprint_batch


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs):
    """(md5, keep_id=min doc_id, n_copies) per distinct content hash."""
    fp = docs.map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "md5"]
    )
    return fp.groupby("md5").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n_copies")
    )


def exact_dedup_keep_first(docs, num_partitions: int = 32,
                           plan: str = "shuffle"):
    """The deduplicated document set itself: rows whose doc_id is the
    smallest among identical content.

    Default plan is ONE hash(md5)%P shuffle with a vectorized first-per-md5
    filter inside each partition — no corpus-wide state anywhere (the
    keeper-id list of a 100-TB corpus would not fit a driver).
    ``plan="broadcast"`` keeps the old small-corpus shortcut: collect the
    (small) keeper-id list once and filter the streaming docs against it."""
    if plan == "broadcast":
        keep = exact_dedup(docs).select_columns(["keep_id"]).to_pandas()["keep_id"]
        keep_ref = ray.put(np.sort(keep.to_numpy().astype(np.int64)))

        def f(batch: pa.Table) -> pa.Table:
            k = ray.get(keep_ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(np.isin(ids, k)))

        return docs.map_batches(f, batch_format="pyarrow")

    from ..functions.hashing import stable_hash_strings

    P = np.uint64(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        import hashlib

        md5s = pa.array(
            [hashlib.md5(t.encode()).hexdigest()
             for t in batch["text"].to_pylist()],
            pa.string(),
        )
        part = (stable_hash_strings(md5s) % P).astype(np.int32)
        return batch.append_column("md5", md5s).append_column(
            "part", pa.array(part)
        )

    def keep_first(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("md5", "ascending"), ("doc_id", "ascending")]
        )
        s = group.take(idx)
        m = s["md5"].combine_chunks()
        n = len(m)
        if n == 0:
            return s.drop_columns(["part", "md5"])
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = ~pc.equal(m.slice(1), m.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        return s.filter(pa.array(first)).drop_columns(["part", "md5"])

    return (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashStage:
    """Stateful stage: permutation parameters built once per actor
    (`__init__`); the whole batch is shingled, signed and band-keyed by
    three vectorized kernels per `__call__` — no Python loop over docs
    (ADVICE r04 closed the last per-doc shingle loop)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.mh = MinHasher(num_perm)
        self.bands = bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import shingle_hashes_batch

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, offs = shingle_hashes_batch(batch["text"], self.k)
        sigs = self.mh.signature_batch(vals, offs)
        keys = self.mh.band_keys_batch(sigs, self.bands)
        n = len(ids)
        return pa.table(
            {
                "band": pa.array(np.tile(
                    np.arange(self.bands, dtype=np.int32), n)),
                "key": pa.array(keys.ravel()),
                "doc_id": pa.array(np.repeat(ids, self.bands)),
            }
        )


def _bucket_pairs(ds, id_col="doc_id", num_partitions: int = 32,
                  max_bucket: int = MAX_BUCKET, dedup: bool = True):
    """(band, key) buckets -> unique candidate pairs (a < b).  Pair dedup
    uses the part-tagged plan (hash(a,b)%P shuffle + vectorized distinct),
    not a per-pair groupby aggregate.

    Oversized buckets (many identical/boilerplate docs sharing a band key)
    are capped: only a deterministic ``max_bucket``-member sample emits
    pairs, so one degenerate bucket can never produce an O(b^2) task.  The
    sample keeps every duplicate CLUSTER discoverable (all sampled members
    pair with each other); dropped candidates are logged.

    Shuffle plan: (band, key) rows are tagged ``hash(band,key) % P`` and
    bucketed with ONE ``groupby(part)`` — a direct per-(band,key) groupby
    would pay Python per-group overhead for ~#docs×bands mostly-singleton
    groups (the repo's measured map_groups trap).  Inside a part, buckets
    are contiguous runs of a lexsort; only runs of >= 2 members (the rare
    near-dup buckets) do any work."""
    P = np.uint64(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            part = ((band * np.uint64(0x9E3779B97F4A7C15) + key) % P).astype(np.int32)
        return pa.table({
            "band": pa.array(band),
            "key": pa.array(key),
            id_col: batch[id_col],
            "part": pa.array(part),
        })

    def pairs_part(group: pa.Table) -> pa.Table:
        band = group["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = group["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, key, band))
        band, key, ids = band[order], key[order], ids[order]
        newrun = np.concatenate(
            [[True], (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
        )
        starts = np.flatnonzero(newrun)
        ends = np.append(starts[1:], len(ids))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            u = np.unique(ids[s:e])
            if len(u) < 2:
                continue
            if len(u) > max_bucket:
                # deterministic stride sample over the sorted member list —
                # stable across runs/processes, no RNG state
                n_drop = (len(u) * (len(u) - 1)) // 2 - \
                         (max_bucket * (max_bucket - 1)) // 2
                logger.warning(
                    "dedup bucket cap: (band,key) bucket of %d members "
                    "sampled to %d; ~%d candidate pairs dropped", len(u),
                    max_bucket, n_drop,
                )
                u = u[np.linspace(0, len(u) - 1, max_bucket).astype(np.int64)]
            i, j = np.triu_indices(len(u), 1)
            out_a.append(u[i])
            out_b.append(u[j])
        if not out_a:
            return pa.table(
                {"a": pa.array(np.empty(0, np.int64)),
                 "b": pa.array(np.empty(0, np.int64)),
                 "part": pa.array(np.empty(0, np.int32))}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        part = ((a.astype(np.uint64) * np.uint64(1_000_003)
                 + b.astype(np.uint64)) % P).astype(np.int32)
        return pa.table({"a": pa.array(a), "b": pa.array(b), "part": pa.array(part)})

    cand = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pyarrow")
    )
    if not dedup:
        # caller dedups downstream (e.g. inside the first lookup join,
        # where all copies of (a, b) meet in the a%P group) — saves a
        # whole shuffle round; cross-band duplicates are bounded by the
        # band count
        return cand

    def dedup_part(group: pa.Table) -> pa.Table:
        return group.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    return cand.groupby("part").map_groups(dedup_part, batch_format="pyarrow")


@ray.remote
def _split_block(tab: pa.Table, key_col: str, num_partitions: int):
    """One side block -> P key%P sub-tables (stays in the object store)."""
    k = tab[key_col].to_numpy(zero_copy_only=False).astype(np.uint64) \
        % np.uint64(num_partitions)
    return tuple(
        tab.filter(pa.array(k == p)) for p in range(num_partitions)
    )


def partition_side_table(side_ds, key_col: str = "doc_id",
                         num_partitions: int = 32) -> list[list]:
    """Manual hash-partition of a per-doc side table for lookup joins: one
    Ray task per block splits it into ``P`` object-store sub-tables; the
    driver holds ONLY the refs.  Partition ``p`` of the side table is the
    concatenation of every block's p-th sub-table — a resolve task fetches
    just its own partition's refs (cut-proportional traffic, zero
    broadcast).  Built once and reusable across several joins (both
    endpoint lookups of a pair verify share it)."""
    mat = side_ds.materialize()
    per_part: list[list] = [[] for _ in range(num_partitions)]
    for b in mat.iter_internal_ref_bundles():
        for ref, meta in b.blocks:
            if not meta.num_rows:
                continue  # sort/filter can emit degenerate empty blocks
            outs = _split_block.options(num_returns=num_partitions).remote(
                ref, key_col, num_partitions
            )
            if num_partitions == 1:
                outs = [outs]
            for p, r in enumerate(outs):
                per_part[p].append(r)
    return per_part


def _lookup_join(cand, side_parts: list[list], pair_col: str,
                 value_col: str, out_col: str, keep: list[str],
                 num_partitions: int = 32, dedup_keys: tuple | None = None,
                 side_key: str = "doc_id"):
    """Distributed lookup join: attach ``side[value_col]`` (keyed by
    ``side_key``) to every candidate-pair row on ``pair_col``.  Pairs are
    co-located by ONE plain ``groupby(pair_col % P)``; each resolve fetches
    ONLY its partition of the pre-split side table (``side_parts`` from
    :func:`partition_side_table`) and probes it with a sorted searchsorted.
    Deliberately NOT ``Dataset.join`` (its per-partition aggregator actors
    deadlocked small sessions) and NOT a union+groupby (a union input
    defeats the sort fast path — measured 4x the shuffle constant).
    ``dedup_keys``: drop duplicate pair rows on these columns inside the
    resolve (all copies share ``pair_col`` so they meet in one group) —
    lets the caller skip a dedicated dedup round.  Nothing corpus-wide ever
    materializes on the driver."""
    P = np.uint64(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[pair_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = pa.table({c: batch[c] for c in keep})
        return t.append_column("part", pa.array((k % P).astype(np.int32)))

    def resolve(group: pa.Table) -> pa.Table:
        p = int(group["part"][0].as_py())
        side = pa.concat_tables(ray.get(side_parts[p]))
        sk = side[side_key].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(sk, kind="stable")
        sk = sk[order]
        vals = side[value_col].combine_chunks().take(pa.array(order))
        tab = group.select(keep)
        if dedup_keys is not None and tab.num_rows > 1:
            # exact multi-column distinct via lexsort run detection
            arrs = [tab[c].to_numpy(zero_copy_only=False) for c in dedup_keys]
            order = np.lexsort(arrs[::-1])
            dup = np.ones(len(order), bool)
            dup[1:] = np.logical_or.reduce(
                [a[order][1:] != a[order][:-1] for a in arrs]
            )
            tab = tab.take(pa.array(np.sort(order[dup])))
        keys = tab[pair_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(sk, keys)
        if (idx >= len(sk)).any() or (sk[np.minimum(idx, len(sk) - 1)] != keys).any():
            raise KeyError("dedup lookup join miss: pair references unknown doc_id")
        return tab.append_column(out_col, vals.take(pa.array(idx)))

    return (
        cand.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )


def minhash_lsh_pairs(docs, threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3, concurrency: int = 4):
    """Near-duplicate pairs (a, b, jaccard) with exact-Jaccard >= threshold.

    Fully distributed end to end: candidate generation via banded LSH bucket
    groupby; verification via TWO hash joins attaching each endpoint's
    shingle array to the pair row, then a vectorized exact-Jaccard filter —
    the whole-corpus shingle store never exists in one place (the plan the
    round-1 review required for 100-TB viability)."""
    sigs = docs.map_batches(
        MinHashStage, batch_format="pyarrow", batch_size=512,
        concurrency=concurrency,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle_k": shingle_k},
    )
    # cross-band duplicate pairs are deduped inside the first lookup join
    cand = _bucket_pairs(sigs, dedup=False)

    # per-doc shingle table, computed and KEPT distributed; arrays are
    # binary-encoded (raw uint64 bytes) because Arrow hash joins carry
    # binary payloads but not list<> payloads
    def to_shingles(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import shingle_hashes_batch

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        vals, offs = shingle_hashes_batch(batch["text"], shingle_k)
        # zero-copy ragged->binary: one buffer, byte offsets = 8 * hash offs
        sh = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), len(ids),
            [None, pa.py_buffer((offs * 8).astype(np.int64)),
             pa.py_buffer(np.ascontiguousarray(vals, dtype="<u8"))],
        )
        return pa.table(
            {"doc_id": pa.array(ids.astype(np.int64)), "sh": sh})

    # the side table is hash-partitioned ONCE into the object store; both
    # endpoint lookups fetch only their own partitions of it
    sh_parts = partition_side_table(
        docs.map_batches(to_shingles, batch_format="pyarrow")
    )
    withs = _lookup_join(cand, sh_parts, "a", "sh", "sh_a", ["a", "b"],
                         dedup_keys=("a", "b"))
    withs = _lookup_join(withs, sh_parts, "b", "sh", "sh_b",
                         ["a", "b", "sh_a"])

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        sa = batch["sh_a"].to_pylist()
        sb = batch["sh_b"].to_pylist()
        j = np.array([
            jaccard(np.frombuffer(x, np.uint64), np.frombuffer(y, np.uint64))
            for x, y in zip(sa, sb)
        ]) if len(a) else np.empty(0, np.float64)
        m = j >= threshold
        return pa.table(
            {"a": pa.array(a[m]), "b": pa.array(b[m]), "jaccard": pa.array(j[m])}
        )

    return withs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashStage:
    def __init__(self, bands: int = 4):
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = np.array([simhash64(t) for t in batch["text"].to_pylist()],
                        dtype=np.uint64)
        band = np.tile(np.arange(self.bands, dtype=np.int32), len(ids))
        key = np.concatenate([simhash_band_keys(s, self.bands) for s in sigs]) \
            if len(ids) else np.empty(0, np.uint64)
        return pa.table(
            {
                "band": pa.array(band),
                "key": pa.array(key),
                "doc_id": pa.array(np.repeat(ids, self.bands)),
                "sig": pa.array(np.repeat(sigs, self.bands)),
            }
        )


def simhash_pairs(docs, max_hamming: int = 3, bands: int = 4, concurrency: int = 4):
    """Near-dup pairs (a, b, hamming) with hamming(sig_a, sig_b) <= max_hamming.
    Complete for max_hamming < bands (pigeonhole: some band matches exactly).

    Verify is distributed like :func:`minhash_lsh_pairs`: the per-doc
    signature table (8 bytes/doc) stays a Dataset; two hash joins attach
    ``sig_a`` / ``sig_b`` to each candidate pair — no ``take_all()``."""
    sigs = docs.map_batches(
        SimHashStage, batch_format="pyarrow", batch_size=512,
        concurrency=concurrency, fn_constructor_kwargs={"bands": bands},
    ).materialize()
    cand = _bucket_pairs(sigs, dedup=False)

    # one row per doc (band 0 carries the same sig as every band)
    import pyarrow.compute as pc

    sig_ds = sigs.map_batches(
        lambda t: t.filter(pc.equal(t["band"], 0)).select(["doc_id", "sig"]),
        batch_format="pyarrow",
    )
    sig_parts = partition_side_table(sig_ds)
    withs = _lookup_join(cand, sig_parts, "a", "sig", "sig_a", ["a", "b"],
                         dedup_keys=("a", "b"))
    withs = _lookup_join(withs, sig_parts, "b", "sig", "sig_b",
                         ["a", "b", "sig_a"])

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) == 0:
            return pa.table({"a": pa.array(np.empty(0, np.int64)),
                             "b": pa.array(np.empty(0, np.int64)),
                             "hamming": pa.array(np.empty(0, np.int64))})
        # joins may widen uint64 -> int64; the BIT PATTERN is what matters
        sa = batch["sig_a"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        sb = batch["sig_b"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        h = hamming64(sa, sb)
        keep = h <= max_hamming
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep]), "hamming": pa.array(h[keep])}
        )

    return withs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct pair scoring)
# ---------------------------------------------------------------------------

# corpus rows above which ngram_jaccard_pairs refuses the full-store
# broadcast and routes through LSH candidates (or refuses outright when the
# threshold is too low for any sub-quadratic candidate scheme)
NGRAM_BROADCAST_ROWS = 100_000


def _lsh_params_for_threshold(threshold: float, miss: float = 1e-6,
                              max_perm: int = 512) -> tuple[int, int]:
    """(num_perm, bands) with per-pair miss probability (1-t^r)^b <= miss at
    jaccard == threshold, preferring the LARGEST feasible rows-per-band r
    (fewer false candidates) under the permutation budget."""
    for r in range(8, 0, -1):
        b = int(np.ceil(np.log(miss) / np.log1p(-threshold ** r)))
        if r * b <= max_perm:
            return r * b, b
    raise ValueError(
        f"ngram_jaccard_pairs: threshold {threshold} needs more than "
        f"{max_perm} minhash permutations for miss <= {miss}; no feasible "
        "sub-quadratic candidate scheme — use the broadcast path on a "
        "pre-filtered subset, or raise the threshold")


def ngram_jaccard_pairs(docs, threshold: float = 0.1, shingle_k: int = 3,
                        broadcast_rows: int = NGRAM_BROADCAST_ROWS):
    """(a, b, jaccard) for all pairs with exact n-gram Jaccard >= threshold.

    Up to ``broadcast_rows`` docs the shingle store is broadcast once
    (``ray.put``) and each batch scores its rows against the full set — the
    broadcast-small-side shape of similarity.near_dup_cosine.  BEYOND the
    gate the full store never broadcasts: candidates come from
    :func:`minhash_lsh_pairs` with banding solved for a <= 1e-6 per-pair
    miss at the threshold, and its verify stage IS the same exact scorer —
    identical output modulo that documented miss bound.  Thresholds below
    0.2 are refused at scale: every (r, b) banding either blows the
    permutation budget or admits nearly all pairs as candidates (LSH is
    sub-quadratic only when the threshold separates), so a low-threshold
    all-pairs scan must stay an explicit small-set operation."""
    n_docs = docs.count()
    if n_docs > broadcast_rows:
        if threshold < 0.2:
            raise ValueError(
                f"ngram_jaccard_pairs: {n_docs} docs > broadcast gate "
                f"{broadcast_rows} and threshold {threshold} < 0.2 — no "
                "sub-quadratic plan exists at this threshold; pre-filter "
                "the candidate set or raise the threshold")
        num_perm, bands = _lsh_params_for_threshold(threshold)
        return minhash_lsh_pairs(docs, threshold=threshold,
                                 num_perm=num_perm, bands=bands,
                                 shingle_k=shingle_k)
    pdf = docs.select_columns(["doc_id", "text"]).to_pandas()
    store = {int(i): shingle_hashes(t, shingle_k)
             for i, t in zip(pdf["doc_id"], pdf["text"])}
    ref = ray.put(store)

    def pairs(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        oa, ob, oj = [], [], []
        for a in ids:
            sa = st[int(a)]
            for b, sb in st.items():
                if b > a:
                    j = jaccard(sa, sb)
                    if j >= threshold:
                        oa.append(int(a)); ob.append(b); oj.append(j)
        return pa.table({"a": pa.array(oa, pa.int64()),
                         "b": pa.array(ob, pa.int64()),
                         "jaccard": pa.array(oj, pa.float64())})

    return docs.map_batches(pairs, batch_format="pyarrow")


def ngram_jaccard_matrix(docs, shingle_k: int = 3):
    """All-pairs exact Jaccard (test oracle / small candidate sets only —
    O(n^2); the LSH path above is the scale version)."""
    pdf = docs.select_columns(["doc_id", "text"]).to_pandas()
    ids = pdf["doc_id"].to_numpy()
    sh = [shingle_hashes(t, shingle_k) for t in pdf["text"]]
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            out.append((int(ids[i]), int(ids[j]), jaccard(sh[i], sh[j])))
    return out


def _column_hash64(col, col_name: str, op_name: str) -> np.ndarray:
    """uint64 value-identity hash of an Arrow column, identical for equal
    values on every worker: integers/temporals hash by value, strings by the
    version-stable byte polynomial (never a library hash); other types are
    rejected up front instead of erroring deep inside ``map_batches``."""
    typ = col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        from ..functions.hashing import stable_hash_strings

        return stable_hash_strings(col)
    if pa.types.is_temporal(typ):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(
            np.uint64)
    if pa.types.is_integer(typ) or pa.types.is_boolean(typ):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    raise TypeError(
        f"{op_name}: unsupported column type {typ} for {col_name!r} "
        "(integer, boolean, temporal and string columns are supported)")


def distinct_count(ds, group_col: str, distinct_col: str,
                   num_partitions: int = 32):
    """Exact COUNT(DISTINCT distinct_col) per ``group_col`` — the ``unique``
    wide operator, in the engine's standard shape: a per-batch distinct-pair
    combiner, ONE shuffle keyed by ``hash(distinct_col) % P`` (duplicates of
    a value meet in one partition regardless of group), a vectorized
    per-partition distinct + per-group count, and a tiny ``P x groups``
    final sum.  Never groups by the distinct values themselves (the per-key
    groupby trap) and never collects the value set anywhere.

    Returns a pandas DataFrame ``(group_col, n_distinct)`` sorted by group —
    the final combine input is at most ``P x |groups|`` rows, a driver-scale
    table by construction."""
    import numpy as np

    P = np.uint64(num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, distinct_col]).group_by(
            [group_col, distinct_col]).aggregate([])
        v = _column_hash64(t[distinct_col], distinct_col, "distinct_count")
        part = (v * np.uint64(2654435761)) % P
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def count_part(group: pa.Table) -> pa.Table:
        t = group.select([group_col, distinct_col]).group_by(
            [group_col, distinct_col]).aggregate([])
        return t.select([group_col]).group_by([group_col]).aggregate(
            [(group_col, "count")]
        ).rename_columns([group_col, "n_part"])

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_part, batch_format="pyarrow")
        .to_pandas()
    )
    out = (parts.groupby(group_col, as_index=False)["n_part"].sum()
           .rename(columns={"n_part": "n_distinct"})
           .sort_values(group_col).reset_index(drop=True))
    return out


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Steele/Lea/Flood 2014): turns a
    value-identity uint64 (raw integers are NOT uniformly distributed — a
    sequential id column has constant leading zeros) into a well-mixed hash
    whose bit positions are uniform, which the HLL rank statistic requires."""
    z = x.copy()
    with np.errstate(over="ignore"):
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros of a uint64 array (0 -> 64).
    Binary search over shift widths — never float log2, whose rounding
    misreports values just below a power of two."""
    zero = x == 0
    x = x.copy()
    n = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        n[m] += s
        x[m] <<= np.uint64(s)
    n[zero] = 64
    return n


def hll_distinct(ds, group_col: str, distinct_col: str, p: int = 12,
                 num_partitions: int = 32):
    """Approximate COUNT(DISTINCT distinct_col) per ``group_col`` via a
    HyperLogLog sketch (Flajolet–Fuss–Gandouet–Meunier 2007) — the mergeable
    "novel sketch" path for cardinalities where the exact operator's
    shuffle (one row per distinct value) is itself the bottleneck.

    Shape: a per-batch combiner collapses each batch to at most
    ``groups x 2^p`` register rows ``(group, register, rho_max)``, ONE
    shuffle keyed by ``register % P`` merges them with a vectorized
    per-partition max, and the driver folds a ``groups x 2^p``-bounded table
    into estimates.  Communication is O(groups * 2^p) TOTAL regardless of
    input rows — at 100 TB this is the difference between shipping billions
    of distinct user ids and shipping 4 KB of registers per group.

    Deterministic: hashes are the engine's version-stable value hashes
    passed through a fixed splitmix64 finalizer, so the estimate is a pure
    function of the value SET (standard error ~1.04/sqrt(2^p), ~1.6% at
    p=12; small cardinalities use the linear-counting correction).

    Returns a pandas DataFrame ``(group_col, n_approx)`` sorted by group.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"hll_distinct: p={p} out of range [4, 18]")
    m = 1 << p
    P = np.uint64(num_partitions)
    shift = np.uint64(64 - p)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, distinct_col])
        h = _mix64(_column_hash64(t[distinct_col], distinct_col,
                                  "hll_distinct"))
        idx = (h >> shift).astype(np.int32)
        with np.errstate(over="ignore"):
            w = h << np.uint64(p)  # remaining 64-p bits, left-aligned
        rho = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.int32)
        reg = pa.table({
            group_col: t[group_col],
            "register": pa.array(idx),
            "rho": pa.array(rho),
        })
        out = reg.group_by([group_col, "register"]).aggregate([("rho", "max")])
        out = out.rename_columns([group_col, "register", "rho"])
        part = out["register"].to_numpy().astype(np.uint64) % P
        return out.append_column("part", pa.array(part.astype(np.int32)))

    def merge_part(group: pa.Table) -> pa.Table:
        out = group.select([group_col, "register", "rho"]).group_by(
            [group_col, "register"]).aggregate([("rho", "max")])
        return out.rename_columns([group_col, "register", "rho"])

    regs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_part, batch_format="pyarrow")
        .to_pandas()
    )
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {
        16: 0.673, 32: 0.697, 64: 0.709}[m]
    rows = []
    for g, sub in regs.groupby(group_col, sort=True):
        rho = np.zeros(m, np.float64)
        rho[sub["register"].to_numpy()] = sub["rho"].to_numpy()
        est = alpha * m * m / np.sum(np.exp2(-rho))
        nz = np.count_nonzero(rho)
        if est <= 2.5 * m and nz < m:
            est = m * np.log(m / (m - nz))  # linear counting, small range
        rows.append((g, float(est)))
    import pandas as pd

    return pd.DataFrame(rows, columns=[group_col, "n_approx"])


# ---------------------------------------------------------------------------
# near-duplicate CLUSTER assignment (keep-one-per-cluster)
# ---------------------------------------------------------------------------

def dup_clusters(pairs, workdir: str, num_partitions: int = 4,
                 num_cpus_per_actor: float = 0.5):
    """Near-dup pair Dataset ``(a, b)`` -> Dataset ``(doc_id, cluster_id)``:
    every pair endpoint labeled with the SMALLEST doc id of its connected
    component in the pair graph — the canonical "keep one document per
    near-duplicate cluster" step of a training-data pipeline (pair sources:
    :func:`minhash_lsh_pairs`, :func:`simhash_pairs`, embedding near-dup).

    Pure composition of proven pieces, no new distributed machinery:

    1. dense-remap the endpoint set with ``sorted_zip_with_index`` +
       ``edges_to_vids`` (value-sorted, hence MONOTONE: min vid == min doc
       id, so CC labels translate back by array lookup).  The endpoint set
       is the *duplicated* subset of the corpus — orders of magnitude
       smaller than the corpus, it is exact-verification output — and rides
       the vertex-table plan: broadcast under ``BROADCAST_VERTEX_LIMIT``,
       two distributed hash joins beyond it;
    2. mirror the pairs into a symmetric :class:`GraphLayout` under
       ``workdir`` (build dedups and self-loops every endpoint);
    3. ``LabelEngine.connected_components`` — the min-label sweep measured
       at 29M edges/s on a 1.05e9-edge graph (BASELINE.md round 4);
    4. map the checkpointed ``(vid, label)`` Dataset back to doc ids.

    Docs that appear in no pair are implicitly their own cluster; callers
    treat absence as ``cluster_id = doc_id`` (see ``doc_dup_clusters``).
    """
    import os

    import ray.data as rd

    from ..functions.indexing import sorted_zip_with_index
    from ..state.checkpoint import labels_dataset
    from .graph_build import build_graph, edges_to_vids

    P = np.uint64(num_partitions)
    # the pair lineage is consumed TWICE below (endpoint extraction, then
    # edges_to_vids) — pin its blocks so an expensive upstream (minhash
    # signatures + bucket groupby + verify joins) runs once, not twice
    pairs = pairs.materialize()

    def endpoint_partial(batch: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([
            batch["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["b"].to_numpy(zero_copy_only=False).astype(np.int64),
        ]))
        part = (v.astype(np.uint64) % P).astype(np.int32)
        return pa.table({"url": pa.array(v), "part": pa.array(part)})

    def endpoint_distinct(group: pa.Table) -> pa.Table:
        return group.select(["url"]).group_by(["url"]).aggregate([])

    # the vertex-table plan verbatim (column named "url" so the remap can
    # reuse edges_to_vids unchanged — its kernels are dtype-agnostic)
    endpoints = (
        pairs.map_batches(endpoint_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(endpoint_distinct, batch_format="pyarrow")
    )
    vertices, n = sorted_zip_with_index(endpoints, "url", "vid")
    if n == 0:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
        }))
    vertices = vertices.materialize()

    def as_urls(batch: pa.Table) -> pa.Table:
        return pa.table({"src_url": batch["a"], "dst_url": batch["b"]})

    edges = edges_to_vids(
        pairs.map_batches(as_urls, batch_format="pyarrow"), vertices, n)

    def mirror(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    layout = build_graph(
        edges.map_batches(mirror, batch_format="pyarrow"), workdir,
        num_partitions, n_vertices=n, symmetric=True, overwrite=True,
    )

    from ..pipelines.components import LabelEngine

    ck = os.path.join(workdir, "cc_ckpt")
    le = LabelEngine(layout, num_cpus_per_actor=num_cpus_per_actor)
    try:
        le.connected_components(collect=False, checkpoint_dir=ck)
    finally:
        le.shutdown()

    # vid -> doc id is index -> value in the sorted endpoint array (monotone
    # remap).  Gated like edges_to_vids: under the broadcast limit the array
    # ships once by ray.put; beyond it the vertex table never touches the
    # driver — two distributed lookup joins (vid, then label) against the
    # hash-split vertex table resolve both endpoints of every row.
    from .graph_build import BROADCAST_VERTEX_LIMIT

    labels = labels_dataset(ck)
    if n <= BROADCAST_VERTEX_LIMIT:
        vals = vertices.sort("vid").to_pandas()["url"].to_numpy()
        ref = ray.put(np.ascontiguousarray(vals.astype(np.int64)))

        def back(batch: pa.Table) -> pa.Table:
            v = ray.get(ref)
            vid = batch["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
            lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"doc_id": pa.array(v[vid]),
                             "cluster_id": pa.array(v[lab])})

        return labels.map_batches(back, batch_format="pyarrow")

    nparts = max(num_partitions, int(ray.cluster_resources().get("CPU", 8)))
    vparts = partition_side_table(vertices, key_col="vid",
                                  num_partitions=nparts)
    with_doc = _lookup_join(labels, vparts, pair_col="vid",
                            value_col="url", out_col="doc_id",
                            keep=["vid", "label"], num_partitions=nparts,
                            side_key="vid")
    with_cluster = _lookup_join(with_doc, vparts, pair_col="label",
                                value_col="url", out_col="cluster_id",
                                keep=["doc_id", "label"],
                                num_partitions=nparts, side_key="vid")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "cluster_id": batch["cluster_id"].cast(pa.int64()),
        })

    return with_cluster.map_batches(project, batch_format="pyarrow")
