"""Similarity search over an embedding column (vec_id, embedding: list<float>).

- brute-force cosine top-k: broadcast the (normalized) query matrix once via
  ``ray.put``; every batch does one numpy matmul and emits its per-query
  partial top-k; a single groupby(qid) merge yields the global top-k.
  Per-batch work is O(batch x Q x d) dense BLAS — the right baseline shape.
- LSH-bucketed ANN (random hyperplanes): signatures bucket the corpus with
  one groupby; queries probe their own bucket (+ multiprobe neighbors at
  hamming distance 1).  Approximate; recall measured against brute force in
  tests.  This is the scale path: per-query work drops from O(N) to
  O(N / 2^bits * multiprobe).
- embedding-cosine near-dup: EXACT all-pairs >= tau via triangular block
  tiling (one Ray task per block pair over object-store blocks — nothing
  broadcast, quadratic work inherent); the LSH-bucketed variant is the
  sub-quadratic approximate path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _batch_matrix(batch: pa.Table, dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False))
    return ids, emb.astype(dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def topk_cosine(embeddings, queries: np.ndarray, k: int = 10, dtype=np.float32):
    """(qid, vec_id, score) global top-k per query row, ordered by
    (qid, score desc, vec_id).  ``queries``: (Q, d) float array.  ``dtype``
    float32 for throughput (default) or float64 for oracle-grade precision."""
    qn = _normalize(np.asarray(queries, dtype))
    qref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty blocks occur after filters/sorts
            return pa.table({"qid": pa.array(np.empty(0, np.int64)),
                             "vec_id": pa.array(np.empty(0, np.int64)),
                             "score": pa.array(np.empty(0, np.float64))})
        q = ray.get(qref)
        ids, emb = _batch_matrix(batch, q.dtype)
        sims = _normalize(emb) @ q.T  # (B, Q)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        qid = np.repeat(np.arange(q.shape[0], dtype=np.int64), kk)
        vid = ids[top.T.ravel()]
        sc = np.take_along_axis(sims, top, axis=0).T.ravel()
        return pa.table(
            {
                "qid": pa.array(qid),
                "vec_id": pa.array(vid),
                "score": pa.array(sc.astype(np.float64)),
            }
        )

    partials = embeddings.map_batches(partial, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        sc = group["score"].to_numpy(zero_copy_only=False)
        vid = group["vec_id"].to_numpy(zero_copy_only=False)
        qid = group["qid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -sc))[:k]
        return pa.table(
            {
                "qid": pa.array(qid[order]),
                "vec_id": pa.array(vid[order]),
                "score": pa.array(sc[order]),
            }
        )

    return partials.groupby("qid").map_groups(merge, batch_format="pyarrow")


class HyperplaneLsh:
    """Shared random-hyperplane coder (seeded -> identical on every actor)."""

    def __init__(self, dim: int, bits: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits)).astype(np.float32)
        self.bits = bits

    def codes(self, m: np.ndarray) -> np.ndarray:
        b = (m @ self.planes) > 0
        return (b @ (1 << np.arange(self.bits, dtype=np.int64))).astype(np.int64)


def lsh_topk(embeddings, queries: np.ndarray, k: int = 10, bits: int = 6,
             multiprobe: int = 1, dim: int | None = None):
    """Approximate top-k: corpus bucketed by hyperplane code (one groupby);
    each query probes every bucket within hamming distance ``multiprobe`` of
    its own code.  Recall/cost dial: probed fraction ~ sum_{i<=m} C(bits,i)
    / 2^bits."""
    q = _normalize(np.asarray(queries, np.float32))
    if dim is None:
        dim = q.shape[1]
    lsh = HyperplaneLsh(dim, bits)
    qcodes = lsh.codes(q)
    # probe set per bucket: which queries probe it.  Enumerate each query's
    # hamming-<=m neighborhood DIRECTLY via XOR flip masks — sum_{i<=m}
    # C(bits,i) masks per query (137 at bits=16, m=2), never a scan of all
    # 2^bits codes (the r02 driver-loop trap at bits >= 16)
    from itertools import combinations

    masks = np.array(
        [
            sum(1 << b for b in combo)
            for i in range(multiprobe + 1)
            for combo in combinations(range(bits), i)
        ],
        dtype=np.int64,
    )
    cand = (qcodes[:, None] ^ masks[None, :]).ravel()
    qi = np.repeat(np.arange(len(qcodes), dtype=np.int64), len(masks))
    order = np.argsort(cand, kind="stable")
    buckets, starts = np.unique(cand[order], return_index=True)
    probe: dict[int, list[int]] = {
        int(b): s.tolist()
        for b, s in zip(buckets, np.split(qi[order], starts[1:]))
    }
    qref = ray.put((q, probe))

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array(np.empty(0, np.int64)),
                             "vec_id": pa.array(np.empty(0, np.int64)),
                             "embedding": batch["embedding"]})
        ids, emb = _batch_matrix(batch)
        codes = lsh.codes(_normalize(emb))
        return pa.table(
            {
                "bucket": pa.array(codes),
                "vec_id": pa.array(ids),
                "embedding": batch["embedding"],
            }
        )

    tagged = embeddings.map_batches(tag, batch_format="pyarrow")

    def search(group: pa.Table) -> pa.Table:
        qm, pr = ray.get(qref)
        bucket = int(group["bucket"][0].as_py())
        qids = pr.get(bucket, [])
        if not qids:
            return pa.table({"qid": pa.array(np.empty(0, np.int64)),
                             "vec_id": pa.array(np.empty(0, np.int64)),
                             "score": pa.array(np.empty(0, np.float64))})
        ids, emb = _batch_matrix(group)
        sims = _normalize(emb) @ qm[qids].T
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        qid = np.repeat(np.asarray(qids, np.int64), kk)
        vid = ids[top.T.ravel()]
        sc = np.take_along_axis(sims, top, axis=0).T.ravel()
        return pa.table({"qid": pa.array(qid), "vec_id": pa.array(vid),
                         "score": pa.array(sc.astype(np.float64))})

    partials = tagged.groupby("bucket").map_groups(search, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        sc = group["score"].to_numpy(zero_copy_only=False)
        vid = group["vec_id"].to_numpy(zero_copy_only=False)
        qid = group["qid"].to_numpy(zero_copy_only=False)
        # a vector can reach a query through several probed buckets — dedup
        _, first = np.unique(vid, return_index=True)
        order = first[np.lexsort((vid[first], -sc[first]))][:k]
        return pa.table({"qid": pa.array(qid[order]), "vec_id": pa.array(vid[order]),
                         "score": pa.array(sc[order])})

    return partials.groupby("qid").map_groups(merge, batch_format="pyarrow")


# parquet bytes above which k-means training re-reads the lineage per round
# instead of pinning the whole corpus in the object store for 10 iterations
# (the pin is pure spill pressure at 100-TB embedding scale; re-reading
# streams with backpressure and touches only the two needed columns)
PIN_CORPUS_LIMIT = 8 << 30


def kmeans_centroids_distributed(embeddings, n_centroids: int,
                                 iters: int = 10,
                                 pin_corpus: bool | None = None) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL corpus — the IVF codebook
    scale path.  Each round broadcasts the k×d centroid matrix once
    (``ray.put``), every batch emits per-centroid (sum-vector, count)
    partials, and the driver folds the tiny partials into new centroids.
    Only k×d floats ever exist on the driver; the corpus streams.
    Deterministic: seeded by the first k corpus rows, fixed iteration count.

    ``pin_corpus``: True pins the corpus blocks once and reuses them every
    round (fastest when it fits); False re-executes the read lineage per
    round (no object-store pin — the 100-TB default); None decides by the
    input's parquet bytes vs ``PIN_CORPUS_LIMIT`` (metadata only, never
    executes the plan; non-file datasets already live in the object store
    and pin for free)."""
    import os as _os

    pdf0 = embeddings.limit(n_centroids).to_pandas()
    c = _normalize(np.vstack(pdf0["embedding"].to_numpy()).astype(np.float32))
    k, d = c.shape
    corpus = embeddings.select_columns(["vec_id", "embedding"])
    if pin_corpus is None:
        try:
            files = embeddings.input_files() or []
            est = sum(_os.path.getsize(f) for f in files)
            pin_corpus = est <= PIN_CORPUS_LIMIT
        except Exception:
            pin_corpus = True  # in-memory source: blocks are already pinned
    if pin_corpus:
        corpus = corpus.materialize()
    for _ in range(iters):
        cref = ray.put(c)

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"cid": pa.array(np.empty(0, np.int64)),
                                 "cnt": pa.array(np.empty(0, np.int64)),
                                 "vec": pa.array([], pa.binary())})
            cents = ray.get(cref)
            _, emb = _batch_matrix(batch)
            m = _normalize(emb)
            assign = np.argmax(m @ cents.T, axis=1)
            sums = np.zeros((len(cents), m.shape[1]), np.float64)
            np.add.at(sums, assign, m.astype(np.float64))
            cnt = np.bincount(assign, minlength=len(cents)).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pa.table({
                "cid": pa.array(nz.astype(np.int64)),
                "cnt": pa.array(cnt[nz]),
                "vec": pa.array([sums[i].tobytes() for i in nz], pa.binary()),
            })

        folded = corpus.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((k, d), np.float64)
        cnts = np.zeros(k, np.int64)
        for cid, cnt, vec in zip(folded["cid"], folded["cnt"], folded["vec"]):
            sums[int(cid)] += np.frombuffer(vec, np.float64)
            cnts[int(cid)] += int(cnt)
        nz = cnts > 0
        c = c.astype(np.float64)
        c[nz] = sums[nz] / cnts[nz, None]  # empty clusters keep old centroid
        c = _normalize(c).astype(np.float32)
    return c


def kmeans_centroids(m: np.ndarray, n_centroids: int, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's k-means on (normalized) vectors — the IVF codebook.
    Driver-side over a SAMPLE of the corpus;
    :func:`kmeans_centroids_distributed` is the default full-corpus path."""
    rng = np.random.default_rng(seed)
    m = _normalize(np.asarray(m, np.float32))
    c = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ c.T, axis=1)
        for j in range(len(c)):
            sel = m[assign == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(embeddings, queries: np.ndarray, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             train_sample: int = 4096, seed: int = 42,
             train: str = "distributed"):
    """IVF approximate top-k: corpus bucketed by nearest k-means centroid
    (ONE groupby); each query probes its ``nprobe`` nearest centroid buckets.
    Same downstream shape as :func:`lsh_topk`; per-query work drops from
    O(N) to ~O(N * nprobe / n_centroids).  Recall measured vs brute force in
    tests.

    ``train="distributed"`` (default) trains the codebook with full-corpus
    map_batches partial sums (:func:`kmeans_centroids_distributed`);
    ``"sample"`` trains driver-side on the first ``train_sample`` rows."""
    q = _normalize(np.asarray(queries, np.float32))
    if train == "distributed":
        cents = kmeans_centroids_distributed(embeddings, n_centroids)
    else:
        tr = np.vstack(
            embeddings.limit(train_sample).to_pandas()["embedding"].to_numpy()
        ).astype(np.float32)
        cents = kmeans_centroids(tr, n_centroids, seed=seed)
    # probe map: bucket -> list of query indices probing it
    probe: dict[int, list[int]] = {}
    order = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    for qi, buckets in enumerate(order):
        for b in buckets:
            probe.setdefault(int(b), []).append(qi)
    qref = ray.put((q, probe))
    cref = ray.put(cents)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array(np.empty(0, np.int64)),
                             "vec_id": pa.array(np.empty(0, np.int64)),
                             "embedding": batch["embedding"]})
        c = ray.get(cref)
        ids, emb = _batch_matrix(batch)
        bucket = np.argmax(_normalize(emb) @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(bucket), "vec_id": pa.array(ids),
             "embedding": batch["embedding"]}
        )

    tagged = embeddings.map_batches(tag, batch_format="pyarrow")

    def search(group: pa.Table) -> pa.Table:
        qm, pr = ray.get(qref)
        bucket = int(group["bucket"][0].as_py())
        qids = pr.get(bucket, [])
        if not qids:
            return pa.table({"qid": pa.array(np.empty(0, np.int64)),
                             "vec_id": pa.array(np.empty(0, np.int64)),
                             "score": pa.array(np.empty(0, np.float64))})
        ids, emb = _batch_matrix(group)
        sims = _normalize(emb) @ qm[qids].T
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        qid = np.repeat(np.asarray(qids, np.int64), kk)
        vid = ids[top.T.ravel()]
        sc = np.take_along_axis(sims, top, axis=0).T.ravel()
        return pa.table({"qid": pa.array(qid), "vec_id": pa.array(vid),
                         "score": pa.array(sc.astype(np.float64))})

    partials = tagged.groupby("bucket").map_groups(search, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        sc = group["score"].to_numpy(zero_copy_only=False)
        vid = group["vec_id"].to_numpy(zero_copy_only=False)
        qid = group["qid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -sc))[:k]
        return pa.table({"qid": pa.array(qid[order]), "vec_id": pa.array(vid[order]),
                         "score": pa.array(sc[order])})

    return partials.groupby("qid").map_groups(merge, batch_format="pyarrow")


def near_dup_cosine_lsh(embeddings, tau: float = 0.95, bits: int = 8,
                        seed: int = 42):
    """Approximate all-pairs cosine >= tau — the SCALE path for
    :func:`near_dup_cosine`: vectors are tagged with every hyperplane code
    within hamming distance 1 of their own (multiprobe replication), one
    groupby co-locates candidates, pairs are verified inside each bucket.
    No corpus broadcast; work per bucket ~ (N/2^bits * (bits+1))^2.
    Approximate: pairs whose codes differ in >1 bit are missed — recall vs
    the exact kernel is pinned in tests."""
    pdf0 = embeddings.limit(1).to_pandas()
    dim = len(pdf0["embedding"].iloc[0])
    lsh = HyperplaneLsh(dim, bits, seed)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array(np.empty(0, np.int64)),
                             "vec_id": pa.array(np.empty(0, np.int64)),
                             "embedding": batch["embedding"]})
        ids, emb = _batch_matrix(batch)
        codes = lsh.codes(_normalize(emb))
        # replicate each row into its own bucket + all hamming-1 buckets
        reps = np.concatenate(
            [codes] + [codes ^ (1 << b) for b in range(bits)]
        )
        rid = np.tile(ids, bits + 1)
        remb = pa.concat_arrays(
            [batch["embedding"].combine_chunks()] * (bits + 1)
        )
        return pa.table(
            {"bucket": pa.array(reps), "vec_id": pa.array(rid),
             "embedding": remb}
        )

    tagged = embeddings.map_batches(tag, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        ids, emb = _batch_matrix(group)
        uniq, first = np.unique(ids, return_index=True)
        m = _normalize(emb[first])
        sims = m @ m.T
        i, j = np.nonzero(np.triu(sims >= tau, 1))
        return pa.table(
            {"a": pa.array(uniq[i]), "b": pa.array(uniq[j]),
             "cosine": pa.array(sims[i, j].astype(np.float64))}
        )

    cand = tagged.groupby("bucket").map_groups(pairs, batch_format="pyarrow")

    # a pair can fire in several buckets — one exact dedup groupby
    def first_only(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return cand.groupby(["a", "b"]).map_groups(first_only, batch_format="pyarrow")


@ray.remote
def _block_pair_cosine(blk_i, blk_j, same: bool, tau: float, dtype_str: str):
    """Cosine >= tau pairs between two embedding blocks (object-store
    resident; one task per block pair)."""
    dtype = np.dtype(dtype_str)
    ia, ea = blk_i
    ib, eb = blk_j
    sims = _normalize(ea.astype(dtype)) @ _normalize(eb.astype(dtype)).T
    if same:
        bi, bj = np.nonzero(np.triu(sims >= tau, 1))
    else:
        bi, bj = np.nonzero(sims >= tau)
    a, b = ia[bi], ib[bj]
    sw = a > b
    a2 = np.where(sw, b, a)
    b2 = np.where(sw, a, b)
    return pa.table(
        {"a": pa.array(a2), "b": pa.array(b2),
         "cosine": pa.array(sims[bi, bj].astype(np.float64))}
    )


def near_dup_cosine(embeddings, tau: float = 0.95, dtype=np.float32,
                    block_rows: int = 8192):
    """All pairs (a < b, cosine >= tau), EXACT.

    The O(N^2) similarity matrix is tiled: the corpus is materialized as
    object-store blocks of ``block_rows`` vectors and one Ray task computes
    each (i, j<=i) block pair — no worker ever holds more than two blocks,
    and nothing is broadcast.  The inherent quadratic work is the price of
    exactness; :func:`near_dup_cosine_lsh` is the sub-quadratic approximate
    path.  ``dtype=np.float64`` for oracle-grade comparisons against SQL
    twins."""
    blocks = []
    for batch in embeddings.select_columns(["vec_id", "embedding"]).iter_batches(
        batch_format="pyarrow", batch_size=block_rows
    ):
        ids, emb = _batch_matrix(batch, np.float32)
        blocks.append(ray.put((ids, emb)))
    futs = []
    for i in range(len(blocks)):
        for j in range(i + 1):
            futs.append(_block_pair_cosine.remote(
                blocks[i], blocks[j], i == j, tau, np.dtype(dtype).name
            ))
    import ray.data as rd

    return rd.from_arrow_refs(futs)
