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


def exact_dedup_keep_first(docs):
    """The deduplicated document set itself: rows whose doc_id is the keeper.
    Keeper ids are broadcast (one hash + id per DISTINCT content — small);
    at extreme scale this becomes a semi-join on md5."""
    keep = exact_dedup(docs).select_columns(["keep_id"]).to_pandas()["keep_id"]
    keep_ref = ray.put(np.sort(keep.to_numpy().astype(np.int64)))

    def f(batch: pa.Table) -> pa.Table:
        k = ray.get(keep_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(np.isin(ids, k)))

    return docs.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashStage:
    """Stateful stage: permutation parameters + compiled tokenizer built once
    per actor (`__init__`), signatures per batch (`__call__`)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        from ..functions.hashing import TokenHashCache

        self.mh = MinHasher(num_perm)
        self.bands = bands
        self.k = shingle_k
        self.cache = TokenHashCache()  # per-actor memo, built once

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_band, out_key, out_id = [], [], []
        for i, t in zip(ids, texts):
            sig = self.mh.signature(shingle_hashes(t, self.k, self.cache))
            keys = self.mh.band_keys(sig, self.bands)
            out_band.append(np.arange(self.bands, dtype=np.int32))
            out_key.append(keys)
            out_id.append(np.full(self.bands, i, dtype=np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band)),
                "key": pa.array(np.concatenate(out_key)),
                "doc_id": pa.array(np.concatenate(out_id)),
            }
        )


def _bucket_pairs(ds, id_col="doc_id", num_partitions: int = 32,
                  max_bucket: int = MAX_BUCKET):
    """(band, key) buckets -> unique candidate pairs (a < b).  Pair dedup
    uses the part-tagged plan (hash(a,b)%P shuffle + vectorized distinct),
    not a per-pair groupby aggregate.

    Oversized buckets (many identical/boilerplate docs sharing a band key)
    are capped: only a deterministic ``max_bucket``-member sample emits
    pairs, so one degenerate bucket can never produce an O(b^2) task.  The
    sample keeps every duplicate CLUSTER discoverable (all sampled members
    pair with each other); dropped candidates are logged."""

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group[id_col].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {"a": pa.array(np.empty(0, np.int64)),
                 "b": pa.array(np.empty(0, np.int64)),
                 "part": pa.array(np.empty(0, np.int32))}
            )
        if len(ids) > max_bucket:
            # deterministic stride sample over the sorted member list —
            # stable across runs/processes, no RNG state
            n_drop = (len(ids) * (len(ids) - 1)) // 2 - \
                     (max_bucket * (max_bucket - 1)) // 2
            logger.warning(
                "dedup bucket cap: (band,key) bucket of %d members sampled "
                "to %d; ~%d candidate pairs dropped", len(ids), max_bucket,
                n_drop,
            )
            ids = ids[np.linspace(0, len(ids) - 1, max_bucket).astype(np.int64)]
        i, j = np.triu_indices(len(ids), 1)
        a, b = ids[i].astype(np.int64), ids[j].astype(np.int64)
        part = ((a.astype(np.uint64) * np.uint64(1_000_003)
                 + b.astype(np.uint64)) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table({"a": pa.array(a), "b": pa.array(b), "part": pa.array(part)})

    cand = ds.groupby(["band", "key"]).map_groups(pairs, batch_format="pyarrow")

    def dedup_part(group: pa.Table) -> pa.Table:
        return group.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    return cand.groupby("part").map_groups(dedup_part, batch_format="pyarrow")


def _lookup_join(cand, side_ds, pair_col: str, value_col: str, out_col: str,
                 keep: dict[str, pa.DataType], value_type: pa.DataType,
                 num_partitions: int = 32):
    """Distributed lookup join: attach ``side_ds[value_col]`` (keyed by
    ``doc_id``) to every candidate-pair row on ``pair_col``, keeping
    ``keep`` columns.  Both sides are tagged ``key % P`` and co-located by
    ONE ``groupby(part)`` with a vectorized searchsorted resolve inside —
    the repo's measured-fast shuffle plan.  Deliberately NOT
    ``Dataset.join``: its hash-shuffle aggregator actors reserve a CPU per
    partition, and two joins in one DAG deadlock small sessions (observed)
    while burning actor slots at scale.  Nothing materializes driver-side.
    """
    P = np.uint64(num_partitions)
    cols_order = list(keep) + ["__key", "__val", "__side", "part"]

    def tag_pairs(batch: pa.Table) -> pa.Table:
        k = batch[pair_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        # unchecked casts: uint64 payloads (simhash sigs) must keep their
        # BIT PATTERN through the int64 shuffle schema
        cols = {c: batch[c].cast(t, safe=False) for c, t in keep.items()}
        cols["__key"] = pa.array(k.astype(np.int64))
        cols["__val"] = pa.nulls(batch.num_rows, value_type)
        cols["__side"] = pa.array(np.zeros(batch.num_rows, np.bool_))
        cols["part"] = pa.array((k % P).astype(np.int32))
        return pa.table({c: cols[c] for c in cols_order})

    def tag_side(batch: pa.Table) -> pa.Table:
        k = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cols = {c: pa.nulls(batch.num_rows, t) for c, t in keep.items()}
        cols["__key"] = pa.array(k.astype(np.int64))
        cols["__val"] = batch[value_col].cast(value_type, safe=False)
        cols["__side"] = pa.array(np.ones(batch.num_rows, np.bool_))
        cols["part"] = pa.array((k % P).astype(np.int32))
        return pa.table({c: cols[c] for c in cols_order})

    unioned = cand.map_batches(tag_pairs, batch_format="pyarrow").union(
        side_ds.map_batches(tag_side, batch_format="pyarrow")
    )

    def resolve(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        keys = group["__key"].to_numpy(zero_copy_only=False)
        spos = np.flatnonzero(side)
        ppos = np.flatnonzero(~side)
        out_schema = pa.schema(list(keep.items()) + [(out_col, value_type)])
        if len(ppos) == 0:
            return out_schema.empty_table()
        sk = keys[spos]
        order = np.argsort(sk, kind="stable")
        sk = sk[order]
        vals = group["__val"].combine_chunks().take(pa.array(spos[order]))
        idx = np.searchsorted(sk, keys[ppos])
        if (idx >= len(sk)).any() or (sk[np.minimum(idx, len(sk) - 1)] != keys[ppos]).any():
            raise KeyError("dedup lookup join miss: pair references unknown doc_id")
        pairs_tab = group.take(pa.array(ppos)).select(list(keep))
        return pairs_tab.append_column(out_col, vals.take(pa.array(idx)))

    return unioned.groupby("part").map_groups(resolve, batch_format="pyarrow")


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
    cand = _bucket_pairs(sigs)

    # per-doc shingle table, computed and KEPT distributed; arrays are
    # binary-encoded (raw uint64 bytes) because Arrow hash joins carry
    # binary payloads but not list<> payloads
    def to_shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sh = [shingle_hashes(t, shingle_k) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "sh": pa.array([s.tobytes() for s in sh], pa.binary()),
            }
        )

    sh_ds = docs.map_batches(to_shingles, batch_format="pyarrow")
    i64, bin_ = pa.int64(), pa.binary()
    withs = _lookup_join(cand, sh_ds, "a", "sh", "sh_a",
                         {"a": i64, "b": i64}, bin_)
    withs = _lookup_join(withs, sh_ds, "b", "sh", "sh_b",
                         {"a": i64, "b": i64, "sh_a": bin_}, bin_)

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
    cand = _bucket_pairs(sigs)

    # one row per doc (band 0 carries the same sig as every band)
    import pyarrow.compute as pc

    sig_ds = sigs.map_batches(
        lambda t: t.filter(pc.equal(t["band"], 0)).select(["doc_id", "sig"]),
        batch_format="pyarrow",
    )
    i64 = pa.int64()
    withs = _lookup_join(cand, sig_ds, "a", "sig", "sig_a",
                         {"a": i64, "b": i64}, i64)
    withs = _lookup_join(withs, sig_ds, "b", "sig", "sig_b",
                         {"a": i64, "b": i64, "sig_a": i64}, i64)

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

def ngram_jaccard_pairs(docs, threshold: float = 0.1, shingle_k: int = 3):
    """(a, b, jaccard) for all pairs with exact n-gram Jaccard >= threshold.

    The shingle store for the candidate set is broadcast once (``ray.put``);
    each batch scores its own rows against the full set — the same
    broadcast-small-side shape as similarity.near_dup_cosine.  Use on small /
    pre-filtered candidate sets; minhash_lsh_pairs is the scale path."""
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
