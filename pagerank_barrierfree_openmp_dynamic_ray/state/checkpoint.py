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


def component_sizes_topk(ckpt_dir: str, k: int = 20):
    """Largest components/communities by member count, Dataset-natively:
    per-batch (label, count) partials (one np.unique per block), then ONE
    small groupby over the partials and a k-row sort — the shuffle carries
    per-block distinct labels, never the |V| label table."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False)
        u, c = np.unique(lab, return_counts=True)
        return pa.table({"label": pa.array(u.astype(np.int64)),
                         "n_part": pa.array(c.astype(np.int64))})

    return (
        labels_dataset(ckpt_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n_part", alias_name="size"))
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
