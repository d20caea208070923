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
    k tokens contribute their single full-token-sequence hash."""
    toks = TOKEN_RE.findall(text)
    th = (cache or _SHARED_CACHE).hash_tokens(toks)
    if len(th) == 0:
        return np.array([0], dtype=np.uint64)
    if len(th) < k:
        th = np.pad(th, (0, k - len(th)))
    with np.errstate(over="ignore"):
        out = np.zeros(len(th) - k + 1, dtype=np.uint64)
        for i in range(k):
            out = out * np.uint64(1099511628211) + th[i: len(th) - k + 1 + i]
    return np.unique(out)


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
