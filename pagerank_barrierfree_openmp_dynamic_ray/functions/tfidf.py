"""TF-IDF term scoring over the documents table.

The corpus-statistics primitive a webtext pipeline runs before filtering or
indexing: per-document term frequency (tf), global document frequency (df),
and per-document top-k terms by tf-idf.  All token work is Arrow-vectorized
(``utf8_lower`` + ``split_pattern_regex`` + list flatten — never a Python
loop over rows); the only shuffles are ONE ``hash(term) % P`` part groupby
for df, the same-keyed lookup join attaching df back to tf rows, and ONE
``hash(doc) % P`` part groupby for the per-document top-k.

Determinism contract (shared with the DuckDB twin): tokens are
``lower(text)`` split on ``[^a-z0-9]+`` with empties dropped; the score is
the INTEGER ``tf * ((1000 * N) // df)`` — a milli-quantized idf in exact
integer arithmetic, so Ray and SQL agree bit-for-bit with no float-ulp
ranking risk; ties rank by term ascending.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import stable_hash_strings

TOKEN_SPLIT_RE = "[^a-z0-9]+"

__all__ = ["explode_terms", "doc_term_freq", "term_doc_freq",
           "tfidf_top_terms", "TOKEN_SPLIT_RE"]


def explode_terms(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """(id, term) pairs, one row per token occurrence — vectorized explode."""
    lst = pc.split_pattern_regex(
        pc.utf8_lower(batch[text_col].combine_chunks()),
        pattern=TOKEN_SPLIT_RE)
    terms = lst.flatten()
    parents = pc.list_parent_indices(lst)
    t = pa.table({id_col: batch[id_col].take(parents), "term": terms})
    return t.filter(pc.not_equal(t["term"], ""))


def doc_term_freq(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, term, tf) Dataset.  Documents are row-atomic, so tf is
    complete inside each batch — no shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        g = explode_terms(batch, id_col, text_col).group_by(
            [id_col, "term"]).aggregate([([], "count_all")])
        return g.rename_columns([id_col, "term", "tf"])

    return docs.map_batches(f, batch_format="pyarrow")


def term_doc_freq(docs, id_col: str = "doc_id", text_col: str = "text",
                  num_partitions: int = 32):
    """(term, df) Dataset — documents containing each term.  Per-batch
    count_distinct partial, then ONE hash(term)%P part groupby; a term's
    batch-partials meet in exactly one partition, so the sum is exact."""
    P = np.uint64(num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        g = explode_terms(batch, id_col, text_col).group_by(
            ["term"]).aggregate([(id_col, "count_distinct")])
        g = g.rename_columns(["term", "df_part"])
        h = stable_hash_strings(g["term"])
        return g.append_column(
            "part", pa.array((h % P).astype(np.int32)))

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by(["term"]).aggregate([("df_part", "sum")])
        return g.rename_columns(["term", "df"])

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("part").map_groups(fold, batch_format="pyarrow"))


def tfidf_top_terms(docs, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text", num_partitions: int = 32):
    """Per-document top-``k`` terms by quantized tf-idf: returns a Dataset
    ``(doc_id, rank, term, score)`` with ``rank`` 1-based and ``score =
    tf * ((1000 * N) // df)`` (exact integers end to end).

    Physical plan: tf per batch (no shuffle) -> df via one part groupby ->
    df attached to tf rows by a term-hash lookup join (the side table is
    object-store split once; ``stages.dedup._lookup_join``) -> one
    hash(doc)%P part groupby ranking every document's terms vectorized."""
    from ..stages.dedup import _lookup_join, partition_side_table

    n_docs = docs.count()
    tf = doc_term_freq(docs, id_col, text_col)
    df = term_doc_freq(docs, id_col, text_col, num_partitions)

    def add_hash(batch: pa.Table) -> pa.Table:
        h = stable_hash_strings(batch["term"]).view(np.int64)
        return batch.append_column("term_h", pa.array(h))

    tf = tf.map_batches(add_hash, batch_format="pyarrow")
    df_side = df.map_batches(add_hash, batch_format="pyarrow")
    side_parts = partition_side_table(df_side, key_col="term_h",
                                      num_partitions=num_partitions)
    joined = _lookup_join(
        tf, side_parts, pair_col="term_h", value_col="df", out_col="df",
        keep=[id_col, "term", "tf", "term_h"],
        num_partitions=num_partitions, side_key="term_h")

    P = np.uint64(num_partitions)
    idf_num = 1000 * int(n_docs)

    def tag(batch: pa.Table) -> pa.Table:
        tfv = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = tfv * (idf_num // dfv)
        d = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            id_col: batch[id_col], "term": batch["term"],
            "score": pa.array(score),
            "part": pa.array((d % P).astype(np.int32)),
        })

    def topk(group: pa.Table) -> pa.Table:
        d = group[id_col].to_numpy(zero_copy_only=False)
        s = group["score"].to_numpy(zero_copy_only=False)
        terms = group["term"].to_numpy(zero_copy_only=False)
        # factorize terms: np.unique is sorted, so codes order = term asc
        uniq, codes = np.unique(terms, return_inverse=True)
        order = np.lexsort((codes, -s, d))  # doc asc, score desc, term asc
        d_s = d[order]
        starts = np.flatnonzero(np.concatenate([[True], d_s[1:] != d_s[:-1]]))
        pos = np.arange(len(d_s)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(d_s)]])))
        keep = pos < k
        sel = pa.array(order[keep])
        return pa.table({
            id_col: group[id_col].take(sel),
            "rank": pa.array((pos[keep] + 1).astype(np.int64)),
            "term": group["term"].take(sel),
            "score": group["score"].take(sel),
        })

    return (joined.map_batches(tag, batch_format="pyarrow")
            .groupby("part").map_groups(topk, batch_format="pyarrow"))
