"""Deterministic hashing primitives for the dedup/similarity family:
token/shingle hashes, MinHash signatures, SimHash, banded LSH keys.

Everything is seeded and process-independent (md5-based token hashes; numpy
permutation parameters from ``default_rng(seed)``) so distributed runs are
reproducible — Python's builtin ``hash`` is salted per process and never used.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

TOKEN_RE = re.compile(r"\S+")

_P61 = np.uint64((1 << 61) - 1)  # Mersenne prime modulus for the permutations


def token_hash64(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def stable_hash_strings(arr) -> np.ndarray:
    """Vectorized, environment-stable 64-bit hash of a pyarrow string array
    (polynomial over the utf-8 bytes, wrapping uint64 arithmetic).

    Used wherever a hash decides PARTITION ASSIGNMENT: the value must be
    identical across processes, nodes and library versions, or the same key
    can land in two partitions and survive a per-partition distinct twice
    (silent corruption).  polars/``hash()`` documents its output as unstable
    across versions, so it is never used for partitioning.
    """
    import pyarrow as pa

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(a)
    if n == 0:
        return np.empty(0, np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(a.type) else np.int32
    offsets = np.frombuffer(a.buffers()[1], dtype=off_dtype)[
        a.offset: a.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    starts, ends = offsets[:-1], offsets[1:]
    lengths = ends - starts
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    nz = lengths > 0
    if not nz.any():
        return out
    base = int(starts[nz][0])
    b = data[base: int(ends[-1])].astype(np.uint64)
    s_nz, l_nz = starts[nz] - base, lengths[nz]
    # position-within-string powers: h(s) = sum b[i] * PRIME^i  (mod 2^64)
    maxlen = int(l_nz.max())
    powers = np.ones(maxlen, np.uint64)
    if maxlen > 1:
        with np.errstate(over="ignore"):
            np.multiply.accumulate(
                np.full(maxlen - 1, _FNV_PRIME, np.uint64), out=powers[1:]
            )
    # offsets are contiguous, so the nonzero segments' bytes are exactly
    # ``b`` in order; segment i starts at cum_prev[i] within the stream
    cum_prev = np.cumsum(l_nz) - l_nz
    pos = np.arange(int(l_nz.sum()), dtype=np.int64) - np.repeat(cum_prev, l_nz)
    with np.errstate(over="ignore"):
        contrib = b * powers[pos]
        sums = np.add.reduceat(contrib, cum_prev)
        out[nz] = (sums * _FNV_PRIME) ^ l_nz.astype(np.uint64)
    return out


class TokenHashCache:
    """Memoized token -> 64-bit hash map (bounded).  Real-corpus token
    frequencies are Zipf-distributed, so a per-actor cache removes the
    md5-per-token cost from the hot path; state lives in the actor
    (`MinHashStage.__init__`), never re-shipped per batch."""

    def __init__(self, max_size: int = 1_000_000):
        self._m: dict[str, int] = {}
        self._max = max_size

    def hash_tokens(self, toks: list[str]) -> np.ndarray:
        m = self._m
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = m.get(t)
            if h is None:
                h = token_hash64(t)
                if len(m) < self._max:
                    m[t] = h
            out[i] = h
        return out


_SHARED_CACHE = TokenHashCache()


def shingle_hashes(text: str, k: int = 3, cache: TokenHashCache | None = None) -> np.ndarray:
    """Hashes of word k-shingles (the MinHash item set).  Texts shorter than
    k tokens contribute their single full-token-sequence hash.  Token hashes
    are the vectorized FNV polynomial (:func:`stable_hash_strings`) so this
    per-doc path and :func:`shingle_hashes_batch` produce IDENTICAL sets;
    ``cache`` is accepted for backward compatibility and ignored (the
    vectorized hash made the per-token memo obsolete)."""
    import pyarrow as pa

    toks = TOKEN_RE.findall(text)
    if not toks:
        return np.array([0], dtype=np.uint64)
    th = stable_hash_strings(pa.array(toks, pa.string()))
    if len(th) < k:
        th = np.pad(th, (0, k - len(th)))
    with np.errstate(over="ignore"):
        out = np.zeros(len(th) - k + 1, dtype=np.uint64)
        for i in range(k):
            out = out * np.uint64(1099511628211) + th[i: len(th) - k + 1 + i]
    return np.unique(out)


def shingle_hashes_batch(arr, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-k-shingle hashes for a WHOLE Arrow string array —
    the batch form of :func:`shingle_hashes` (identical per-doc sets).

    One Arrow ``utf8_split_whitespace`` tokenizes every doc, ONE
    :func:`stable_hash_strings` call hashes the flattened token stream, and
    the k-gram rolling combine + per-doc distinct run as flat numpy over
    doc-offset segments — no Python loop over documents (ADVICE r04: this
    was the hottest Python-level loop left in the engine).

    Returns ``(values, offsets)``: doc ``i``'s sorted distinct shingle
    hashes are ``values[offsets[i]:offsets[i+1]]``; docs with no tokens get
    the single hash 0, exactly like the per-doc path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(a)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(1, np.int64)
    toks = pc.utf8_split_whitespace(a)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, dtype=np.int64)
    tv = toks.values
    # Arrow's split keeps EMPTY tokens at leading/trailing/double whitespace
    # (Python's \S+ does not) — drop them before hashing
    voffs = np.frombuffer(
        tv.buffers()[1],
        dtype=np.int64 if pa.types.is_large_string(tv.type) else np.int32,
    )[tv.offset: tv.offset + len(tv) + 1].astype(np.int64)
    nonempty = (voffs[1:] - voffs[:-1]) > 0
    L_raw = offs[1:] - offs[:-1]
    tok_doc = np.repeat(np.arange(n, dtype=np.int64), L_raw)[nonempty]
    th_all = stable_hash_strings(tv)[nonempty]
    L = np.bincount(tok_doc, minlength=n)
    offs = np.concatenate([[0], np.cumsum(L)]).astype(np.int64)
    # pad every doc to max(L, k) with zero-hashes: len<k docs contribute one
    # padded full-sequence shingle, empty docs the single hash 0 — the exact
    # per-doc semantics, uniformly vectorized
    Lp = np.maximum(L, k)
    Tp = int(Lp.sum())
    starts_p = np.concatenate([[0], np.cumsum(Lp)[:-1]])
    pos = np.arange(Tp, dtype=np.int64) - np.repeat(starts_p, Lp)
    valid = pos < np.repeat(L, Lp)
    thp = np.zeros(Tp, np.uint64)
    thp[valid] = th_all[(np.repeat(offs[:-1], Lp) + pos)[valid]]
    ns = Lp - k + 1  # shingles per doc (>= 1 by construction)
    S = int(ns.sum())
    sh_local = np.arange(S, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(ns)[:-1]]), ns)
    base = np.repeat(starts_p, ns) + sh_local
    out = np.zeros(S, np.uint64)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for i in range(k):
            out = out * prime + thp[base + i]
    # per-doc sorted distinct via one lexsort + run detection
    doc = np.repeat(np.arange(n, dtype=np.int64), ns)
    order = np.lexsort((out, doc))
    o, dd = out[order], doc[order]
    keep = np.ones(S, dtype=bool)
    keep[1:] = (dd[1:] != dd[:-1]) | (o[1:] != o[:-1])
    counts = np.bincount(dd[keep], minlength=n)
    return o[keep], np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


class MinHasher:
    """num_perm universal-hash permutations (a*x+b mod 2^61-1)."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _P61, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _P61, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (shingles[:, None] * self.a[None, :] + self.b[None, :]) % _P61
        return h.min(axis=0).astype(np.uint64)

    def band_keys(self, sig: np.ndarray, bands: int) -> np.ndarray:
        """One uint64 key per band (md5 of the band's rows)."""
        r = self.num_perm // bands
        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(sig[i * r: (i + 1) * r].tobytes()).digest()[:8],
                    "little",
                )
                for i in range(bands)
            ),
            np.uint64,
            bands,
        )

    def signature_batch(self, vals: np.ndarray,
                        offsets: np.ndarray) -> np.ndarray:
        """Signatures for MANY docs at once: ``(vals, offsets)`` is the
        :func:`shingle_hashes_batch` layout.  One (S, num_perm) permute
        matrix + ``minimum.reduceat`` over the doc segments — bit-identical
        to per-doc :meth:`signature` (every doc has >= 1 shingle, so the
        reduceat segments are all non-empty)."""
        with np.errstate(over="ignore"):
            h = (vals[:, None] * self.a[None, :] + self.b[None, :]) % _P61
        return np.minimum.reduceat(h, offsets[:-1], axis=0).astype(np.uint64)

    def band_keys_batch(self, sigs: np.ndarray, bands: int) -> np.ndarray:
        """(n, bands) bucket keys for a signature matrix — the FNV byte
        polynomial of each band's ``r`` signature rows, fully vectorized
        (identical signatures => identical keys; only BUCKETING depends on
        the key function, and every candidate is exact-verified downstream,
        so this differs from per-doc md5 ``band_keys`` by design)."""
        n = len(sigs)
        r = self.num_perm // bands
        rec = (np.ascontiguousarray(sigs, dtype="<u8")
               .view(np.uint8).reshape(n * bands, 8 * r).astype(np.uint64))
        powers = np.ones(8 * r, np.uint64)
        with np.errstate(over="ignore"):
            if 8 * r > 1:
                np.multiply.accumulate(
                    np.full(8 * r - 1, _FNV_PRIME, np.uint64), out=powers[1:])
            keys = (rec * powers[None, :]).sum(
                axis=1, dtype=np.uint64) * _FNV_PRIME
        return keys.reshape(n, bands) ^ np.uint64(8 * r)


def simhash64(text: str, cache: TokenHashCache | None = None) -> np.uint64:
    """Classic 64-bit SimHash over token hashes."""
    toks = TOKEN_RE.findall(text)
    if not toks:
        return np.uint64(0)
    th = (cache or _SHARED_CACHE).hash_tokens(toks)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in np.flatnonzero(v > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    return np.array([bin(int(v)).count("1") for v in np.atleast_1d(x)], dtype=np.int64)


def simhash_band_keys(sig: np.uint64, bands: int = 4) -> np.ndarray:
    """Split the 64-bit signature into ``bands`` equal bit blocks; near-dups
    within hamming distance < bands share at least one block exactly."""
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    s = np.uint64(sig)
    return np.array(
        [(s >> np.uint64(i * width)) & mask for i in range(bands)], dtype=np.uint64
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0
