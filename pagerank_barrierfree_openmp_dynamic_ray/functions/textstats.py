"""Text analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All stateless, vectorized ``map_batches`` stages over the ``documents`` table
(doc_id, text, lang, source, n_chars).  Every definition here has an exact
ANSI-SQL twin in ``__ray_entry__.oracle_sql`` (DuckDB) — the definitions are
deliberately regex-arithmetic so the driver's value-hash comparison holds
bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer pieces; explicit ASCII classes so the RE2 (DuckDB)
# twin '[0-9A-Za-z_]+|[^0-9A-Za-z_\s]' matches byte-for-byte on unicode text
WORDISH_RE = re.compile(r"[0-9A-Za-z_]+|[^0-9A-Za-z_\s]")
PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")  # exactly string.punctuation
CJK_RE = re.compile(r"[一-鿿]")

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")

# language marker words for the n-gram/stopword heuristic language id
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "las"),
}
_LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    n_tok = np.fromiter((len(TOKEN_RE.findall(t)) for t in texts), np.int64, len(texts))
    n_pieces = np.fromiter(
        (len(WORDISH_RE.findall(t)) for t in texts), np.int64, len(texts)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_pieces": pa.array(n_pieces),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality heuristics: length, token stats, punctuation + stopword
    ratios.  A doc passes the quality gate when it has >= 10 tokens, mean
    token length in [2, 12], and punct_ratio < 0.2 (Gopher-style bounds)."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    n_chars = np.fromiter((len(t) for t in texts), np.int64, n)
    toks = [TOKEN_RE.findall(t) for t in texts]
    n_tok = np.fromiter((len(t) for t in toks), np.int64, n)
    tok_chars = np.fromiter((sum(len(w) for w in t) for t in toks), np.int64, n)
    n_punct = np.fromiter((len(PUNCT_RE.findall(t)) for t in texts), np.int64, n)
    n_stop = np.fromiter(
        (sum(1 for w in t if w in STOPWORDS) for t in toks), np.int64, n
    )
    safe_tok = np.maximum(n_tok, 1)
    mean_tok_len = tok_chars / safe_tok
    punct_ratio = n_punct / np.maximum(n_chars, 1)
    stop_ratio = n_stop / safe_tok
    passed = (n_tok >= 10) & (mean_tok_len >= 2) & (mean_tok_len <= 12) & (
        punct_ratio < 0.2
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars_m": pa.array(n_chars),
            "n_tokens": pa.array(n_tok),
            "mean_tok_len": pa.array(mean_tok_len),
            "punct_ratio": pa.array(punct_ratio),
            "stop_ratio": pa.array(stop_ratio),
            "quality_pass": pa.array(passed),
        }
    )


def lang_id_one(text: str) -> str:
    if CJK_RE.search(text):
        return "zh"
    toks = TOKEN_RE.findall(text.lower())
    best, best_score = "und", 0
    for lang in _LANG_ORDER:
        score = sum(1 for w in toks if w in LANG_MARKERS[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id_batch(batch: pa.Table) -> pa.Table:
    langs = [lang_id_one(t) for t in batch["text"].to_pylist()]
    return pa.table(
        {"doc_id": batch["doc_id"], "lang_pred": pa.array(langs, pa.string())}
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprints: md5 hex (exact-dedup key, SQL twin: ``md5()``)
    and a 64-bit rolling polynomial hash over tokens (shift-invariant-ish
    fingerprint used by the near-dup family; no SQL twin)."""
    texts = batch["text"].to_pylist()
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    rolls = np.fromiter(
        (rolling_hash(TOKEN_RE.findall(t)) for t in texts), np.uint64, len(texts)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "md5": pa.array(md5s, pa.string()),
            "rolling64": pa.array(rolls),
        }
    )


_B = np.uint64(1099511628211)  # FNV-ish multiplier


def rolling_hash(tokens: list[str]) -> np.uint64:
    h = np.uint64(14695981039346656037)
    with np.errstate(over="ignore"):
        for w in tokens:
            tw = np.uint64(
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            )
            h = (h * _B) ^ tw
    return h


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Duplicate-line repetition stats (the RefinedWeb / MassiveText
    boilerplate signal: docs whose lines repeat are nav chrome, not prose):
    per doc, the count of non-empty lines, how many are duplicates of an
    earlier line, and the duplicate fraction.

    Vectorized end to end: one Arrow ``split_pattern`` gives every line of
    the batch as a flat string array; a stable 64-bit line hash + one
    lexsort counts per-doc distinct lines with no Python loop.  Distinctness
    is decided on the 64-bit hash — a cross-line collision inside one doc
    (~1e-13 at 10k lines) would undercount distinct by one; acceptable for
    a quality *signal*, and the oracle corpus is collision-checked by the
    test suite.  SQL twin: ``string_split(text, chr(10))`` + ``COUNT`` /
    ``COUNT(DISTINCT)`` per doc."""
    import pyarrow.compute as pc

    from .hashing import stable_hash_strings

    arr = batch["text"]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    lines = pc.split_pattern(arr, pattern="\n")
    counts = lines.value_lengths().to_numpy(zero_copy_only=False)
    flat = lines.flatten()
    doc_ix = np.repeat(np.arange(n, dtype=np.int64), counts)
    nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    ix = doc_ix[nonempty]
    h = stable_hash_strings(flat)[nonempty]
    n_lines = np.bincount(ix, minlength=n)
    order = np.lexsort((h, ix))
    si, sh = ix[order], h[order]
    first = np.ones(len(si), dtype=bool)
    first[1:] = (si[1:] != si[:-1]) | (sh[1:] != sh[:-1])
    n_distinct = np.bincount(si[first], minlength=n)
    dup = n_lines - n_distinct
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(n_lines.astype(np.int64)),
            "n_dup_lines": pa.array(dup.astype(np.int64)),
            "dup_line_frac": pa.array(dup / np.maximum(n_lines, 1)),
        }
    )


def token_counts(docs):
    return docs.map_batches(token_count_batch, batch_format="pyarrow")


def quality_scores(docs):
    return docs.map_batches(quality_batch, batch_format="pyarrow")


def lang_ids(docs):
    return docs.map_batches(lang_id_batch, batch_format="pyarrow")


def fingerprints(docs):
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")


def repetitions(docs):
    return docs.map_batches(repetition_batch, batch_format="pyarrow")
