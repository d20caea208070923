"""Document chunking — fixed-width character windows with overlap.

The training-data prep step that turns long documents into model-sized
pieces: chunk ``i`` of a document is ``text[i*stride : i*stride + width]``
(codepoint indices), for every ``i`` with ``i*stride < len(text)``; an empty
document yields no chunks.  Stateless and shuffle-free — one ``map_batches``
flat expansion, vectorized per chunk index (``utf8_slice_codeunits`` is
codepoint-exact, verified identical to SQL ``substring`` on non-ASCII).

At 100 TB this is the canonical "rows out >> rows in" stage: output blocks
grow by ~width/stride x, so run it with a small ``batch_size`` and let the
streaming executor split output blocks; nothing is held per-actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["chunk_documents"]


def chunk_documents(docs, width: int = 400, stride: int = 300,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of ``(id_col, chunk_id, chunk_text)`` — ``chunk_id`` is the
    0-based window index.  ``stride < width`` gives overlapping windows
    (the usual training-prep shape); ``stride == width`` tiles exactly."""
    if width <= 0 or stride <= 0:
        raise ValueError("chunk_documents: width and stride must be > 0")

    def f(batch: pa.Table) -> pa.Table:
        text = batch[text_col].combine_chunks()
        n = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        # chunks per doc: ceil(n / stride) bounded below at 0 (empty docs)
        n_chunks = np.maximum((n - 1) // stride + 1, 0)
        outs = []
        # loop over CHUNK INDEX (bounded by the longest doc), each pass
        # vectorized over every doc still long enough — never per-row
        for i in range(int(n_chunks.max()) if len(n_chunks) else 0):
            mask = pa.array(n_chunks > i)
            ids = batch[id_col].filter(mask)
            piece = pc.utf8_slice_codeunits(
                text.filter(mask), start=i * stride, stop=i * stride + width)
            outs.append(pa.table({
                id_col: ids,
                "chunk_id": pa.array(np.full(len(ids), i, dtype=np.int64)),
                "chunk_text": piece,
            }))
        if not outs:
            return pa.table({
                id_col: batch[id_col].slice(0, 0),
                "chunk_id": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            })
        return pa.concat_tables(outs)

    return docs.map_batches(f, batch_format="pyarrow")
