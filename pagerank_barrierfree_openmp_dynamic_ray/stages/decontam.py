"""Benchmark decontamination — the pre-training scrub that flags training
documents sharing word n-grams with a held-out evaluation set (the
GPT-3/PaLM-style 13-gram overlap check, here parameterized by ``k``).

Plan shape (the broadcast-small-side pattern, like ``stages/joins.broadcast_join``):
the benchmark side is SMALL by definition (eval suites are ~1e4-1e6 items,
~1e6-1e8 distinct shingles << any training corpus), so its distinct shingle
hashes are collected once, sorted, ``ray.put`` into the object store, and
every scoring task probes them with a zero-copy ``searchsorted`` — no
shuffle touches the 100-TB train side at all; it streams through one
stateless-per-batch actor pool.  A size gate refuses benchmark sets too big
to broadcast instead of silently OOMing the workers.

Shingles are the same FNV-rolled word k-gram hashes the MinHash family uses
(``functions/hashing.shingle_hashes_batch``): distinct-overlap counts computed on
the 64-bit hashes equal string-level counts absent collisions (~1e-13 per
doc at 10k shingles) — the same documented trade as `textstats.repetition_batch`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import shingle_hashes_batch

# refuse to broadcast beyond ~2 GiB of shingle hashes (2.7e8 uint64): a
# benchmark set bigger than this is not a benchmark set, it is a second
# corpus, and needs the shuffle-join plan instead.
MAX_BENCH_SHINGLES = 270_000_000


def benchmark_shingles(bench_docs, k: int = 3,
                       max_shingles: int = MAX_BENCH_SHINGLES):
    """Benchmark docs Dataset -> ObjectRef of the SORTED distinct uint64
    shingle-hash array.  Per-block unique arrays are computed distributed
    (one map_batches), only the merged distinct set crosses to the driver —
    bounded by the gate, not by the benchmark's text size."""
    import ray

    def block_hashes(batch: pa.Table) -> pa.Table:
        vals, _ = shingle_hashes_batch(batch["text"], k)
        return pa.table({"h": pa.array(np.unique(vals))})

    parts = bench_docs.map_batches(
        block_hashes, batch_format="pyarrow").materialize()
    # gate on the distributed row count (an upper bound on the merged
    # distinct count) BEFORE anything crosses to the driver — the refusal
    # must fire in front of the collection, not after the OOM
    n_rows = parts.count()
    if n_rows > max_shingles:
        raise ValueError(
            f"benchmark set has >= {n_rows} per-block distinct shingles "
            f"(> {max_shingles}); too large for the broadcast plan")
    merged = np.unique(parts.to_pandas()["h"].to_numpy().astype(np.uint64))
    return ray.put(merged)


class ContaminationStage:
    """Stateful scoring stage: the broadcast shingle array is fetched ONCE
    per actor (`__init__`, zero-copy from the local object store), probed
    per batch (`__call__`)."""

    def __init__(self, bench_ref, k: int = 3):
        import ray

        self.bench = ray.get(bench_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals, offs = shingle_hashes_batch(batch["text"], self.k)
        n = batch.num_rows
        n_sh = offs[1:] - offs[:-1]
        bench = self.bench
        if len(bench) and len(vals):
            # ONE searchsorted over the whole batch's shingle stream, hit
            # counts folded per doc segment (no per-doc Python loop)
            pos = np.searchsorted(bench, vals)
            pos[pos == len(bench)] = 0
            hits = (bench[pos] == vals).astype(np.int64)
            n_hit = np.add.reduceat(hits, offs[:-1])
        else:
            n_hit = np.zeros(n, np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_shingles": pa.array(n_sh),
                "n_contaminated": pa.array(n_hit),
                "contamination_frac": pa.array(
                    n_hit / np.maximum(n_sh, 1)),
            }
        )


def contamination(train_docs, bench_ref, k: int = 3, concurrency: int = 4):
    """Score every training doc against the broadcast benchmark shingle set:
    (doc_id, n_shingles, n_contaminated, contamination_frac)."""
    return train_docs.map_batches(
        ContaminationStage,
        fn_constructor_kwargs={"bench_ref": bench_ref, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def decontaminate(train_docs, bench_ref, k: int = 3,
                  max_frac: float = 0.5, concurrency: int = 4):
    """Filter variant: keep only docs whose distinct-shingle overlap with
    the benchmark stays below ``max_frac`` (the rows a training run would
    actually consume)."""

    class Filter(ContaminationStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            scores = super().__call__(batch)
            keep = scores["contamination_frac"].to_numpy() < max_frac
            return batch.filter(pa.array(keep))

    return train_docs.map_batches(
        Filter,
        fn_constructor_kwargs={"bench_ref": bench_ref, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
