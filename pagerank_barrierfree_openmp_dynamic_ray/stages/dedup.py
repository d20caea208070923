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
bucketed with ONE groupby; only within-bucket pairs are verified.  Verify
uses a broadcast doc_id -> shingle-set store at sandbox scale; the scale path
re-partitions candidate pairs by doc_id and joins the shingle table (same
downstream shape, two extra shuffles), noted per function.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Min

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


def _bucket_pairs(ds, id_col="doc_id", num_partitions: int = 32):
    """(band, key) buckets -> unique candidate pairs (a < b).  Pair dedup
    uses the part-tagged plan (hash(a,b)%P shuffle + vectorized distinct),
    not a per-pair groupby aggregate."""

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group[id_col].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {"a": pa.array(np.empty(0, np.int64)),
                 "b": pa.array(np.empty(0, np.int64)),
                 "part": pa.array(np.empty(0, np.int32))}
            )
        i, j = np.triu_indices(len(ids), 1)
        a, b = ids[i].astype(np.int64), ids[j].astype(np.int64)
        part = ((a.astype(np.uint64) * np.uint64(1_000_003)
                 + b.astype(np.uint64)) % np.uint64(num_partitions)).astype(np.int32)
        return pa.table({"a": pa.array(a), "b": pa.array(b), "part": pa.array(part)})

    cand = ds.groupby(["band", "key"]).map_groups(pairs, batch_format="pyarrow")

    def dedup_part(group: pa.Table) -> pa.Table:
        return group.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    return cand.groupby("part").map_groups(dedup_part, batch_format="pyarrow")


def minhash_lsh_pairs(docs, threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3, concurrency: int = 4):
    """Near-duplicate pairs (a, b, jaccard) with exact-Jaccard >= threshold.

    Candidate generation is fully distributed; verification broadcasts a
    doc_id -> shingle array store (scale path: repartition pairs by a, join
    the shingle table twice)."""
    sigs = docs.map_batches(
        MinHashStage, batch_format="pyarrow", batch_size=512,
        concurrency=concurrency,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle_k": shingle_k},
    )
    cand = _bucket_pairs(sigs)

    # shingle store computed DISTRIBUTED (map_batches), only the hash arrays
    # come back to the driver for the broadcast; scale path (noted above)
    # replaces the broadcast with a pair-repartition + shingle-table join
    def to_shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sh = [shingle_hashes(t, shingle_k) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "sh": pa.array([s.tolist() for s in sh], pa.list_(pa.uint64())),
            }
        )

    sh_tab = docs.map_batches(to_shingles, batch_format="pyarrow").to_pandas()
    sh_store = {
        int(i): np.asarray(s, dtype=np.uint64)
        for i, s in zip(sh_tab["doc_id"], sh_tab["sh"])
    }
    store_ref = ray.put(sh_store)

    def verify(batch: pa.Table) -> pa.Table:
        store = ray.get(store_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        j = np.array([jaccard(store[int(x)], store[int(y)]) for x, y in zip(a, b)])
        m = j >= threshold
        return pa.table(
            {"a": pa.array(a[m]), "b": pa.array(b[m]), "jaccard": pa.array(j[m])}
        )

    return cand.map_batches(verify, batch_format="pyarrow")


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
    Complete for max_hamming < bands (pigeonhole: some band matches exactly)."""
    sigs = docs.map_batches(
        SimHashStage, batch_format="pyarrow", batch_size=512,
        concurrency=concurrency, fn_constructor_kwargs={"bands": bands},
    ).materialize()
    cand = _bucket_pairs(sigs)

    sig_map = {
        int(r["doc_id"]): np.uint64(r["sig"])
        for r in sigs.select_columns(["doc_id", "sig"]).take_all()
    }
    ref = ray.put(sig_map)

    def verify(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table({"a": batch["a"], "b": batch["b"],
                             "hamming": pa.array(np.empty(0, np.int64))})
        h = hamming64(
            np.array([m[int(x)] for x in a], np.uint64),
            np.array([m[int(y)] for y in b], np.uint64),
        )
        keep = h <= max_hamming
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep]), "hamming": pa.array(h[keep])}
        )

    return cand.map_batches(verify, batch_format="pyarrow")


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
