"""Checkpoint lineage: per-iteration, per-partition rank/frontier Parquet plus
a lineage.json recording exactly which graph version the ranks belong to —
so a job resumes mid-convergence (SURVEY §4 checkpoint/resume row; the
"hard part (e)": warm-start must know its graph lineage).
"""

from __future__ import annotations

import json
import os
import time


def write_lineage(
    ckpt_dir: str,
    iteration: int,
    residual: float,
    mode: str,
    variant: str,
    graph_path: str,
    num_partitions: int,
    n_vertices: int,
) -> None:
    meta = {
        "iteration": iteration,
        "residual": residual,
        "mode": mode,
        "variant": variant,
        "graph_path": os.path.abspath(graph_path),
        "num_partitions": num_partitions,
        "n_vertices": n_vertices,
        "wall_time": time.time(),
    }
    tmp = os.path.join(ckpt_dir, "lineage.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(ckpt_dir, "lineage.json"))


def read_lineage(ckpt_dir: str) -> dict:
    with open(os.path.join(ckpt_dir, "lineage.json")) as f:
        return json.load(f)


def ranks_dataset(ckpt_dir: str):
    """The checkpointed ranks as a Ray Dataset (vid, rank, affected) —
    downstream pipelines consume ranks without the driver ever holding the
    dense vector."""
    import glob

    import ray.data as rd

    return rd.read_parquet(sorted(glob.glob(os.path.join(ckpt_dir, "part-*.parquet"))))


def rank_topk(ckpt_dir: str, k: int = 20):
    """Dataset-native global top-k by rank (SURVEY §2.6 top-k row):
    per-batch partial top-k (combiner) then one small sort+limit — the
    shuffle carries at most k rows per block, never the full rank table."""
    import numpy as np
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        r = batch["rank"].to_numpy(zero_copy_only=False)
        kk = min(k, len(r))
        if kk == 0:
            return batch.select(["vid", "rank"])
        idx = np.argpartition(-r, kk - 1)[:kk]
        return batch.select(["vid", "rank"]).take(idx)

    return (
        ranks_dataset(ckpt_dir)
        .map_batches(partial, batch_format="pyarrow")
        .sort(["rank", "vid"], descending=[True, False])
        .limit(k)
    )


def labels_dataset(ckpt_dir: str):
    """Checkpointed (vid, label) slices as a Ray Dataset — the CC/LP
    analogue of :func:`ranks_dataset` (LabelEngine ``collect=False``)."""
    import glob

    import ray.data as rd

    return rd.read_parquet(sorted(glob.glob(os.path.join(ckpt_dir, "part-*.parquet"))))


def component_sizes_topk(ckpt_dir: str, k: int = 20, num_partitions: int = 32):
    """Largest components/communities by member count, Dataset-natively:
    per-batch (label, count) partials (one np.unique per block), then the
    standard hash(label)%P part-tag + vectorized per-part sum + per-part
    top-k, and a final k·P-row sort.  A CC result dominated by singleton
    components has ~|V| distinct labels, so a per-key
    ``groupby("label").aggregate`` here would hit the measured 6.5x
    per-group-overhead trap at exactly the 1e9-vertex scale this
    ``collect=False`` path exists for — the shuffle must carry P groups,
    not one per label."""
    import numpy as np
    import pyarrow as pa

    P = np.uint64(num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(lab, return_counts=True)
        part = (u.astype(np.uint64) * np.uint64(2654435761)) % P
        return pa.table({"label": pa.array(u),
                         "n_part": pa.array(c.astype(np.int64)),
                         "part": pa.array(part.astype(np.int32))})

    def topk_part(group: pa.Table) -> pa.Table:
        lab = group["label"].to_numpy(zero_copy_only=False)
        c = group["n_part"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(lab, return_inverse=True)
        size = np.bincount(inv, weights=c, minlength=len(u)).astype(np.int64)
        # per-part candidates: the global top-k is within every part's top-k
        o = np.lexsort((u, -size))[:k]
        return pa.table({"label": pa.array(u[o]), "size": pa.array(size[o])})

    return (
        labels_dataset(ckpt_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk_part, batch_format="pyarrow")
        .sort(["size", "label"], descending=[True, False])
        .limit(k)
    )


def latest_checkpoint(root: str) -> str | None:
    """Newest complete checkpoint directory under ``root`` (one subdir per
    checkpointed iteration, named ``iter-N``; complete == has lineage.json)."""
    if not os.path.isdir(root):
        return None
    best, best_it = None, -1
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if d.startswith("iter-") and os.path.isfile(os.path.join(p, "lineage.json")):
            it = int(d.split("-", 1)[1])
            if it > best_it:
                best, best_it = p, it
    return best
