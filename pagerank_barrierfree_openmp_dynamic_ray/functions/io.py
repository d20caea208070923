"""Input sizing helpers.

Ray's default parquet splitting optimizes for large inputs; handed a
small file it still fans out to dozens of read tasks whose fixed cost
dwarfs the IO (measured on a 10 MB table: 1.8 s at 64 blocks vs 0.18 s at
16).  ``read_parquet_sized`` keeps Ray's own splitting for large inputs and
caps the block count at the CPU budget for small ones — the same code path
serves the sandbox's sf tables and a 100 TB corpus.
"""

from __future__ import annotations

import os


def _input_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def read_parquet_sized(path, columns=None, small_input_bytes: int = 1 << 30,
                       **kwargs):
    """``ray.data.read_parquet`` with a block count matched to input size:
    inputs under ``small_input_bytes`` read as one block per cluster CPU
    (bounded fixed cost); larger inputs keep Ray's own splitting."""
    import ray
    import ray.data as rd

    if (
        "override_num_blocks" not in kwargs
        and _input_bytes(path) < small_input_bytes
    ):
        kwargs["override_num_blocks"] = max(
            8, int(ray.cluster_resources().get("CPU", 8))
        )
    return rd.read_parquet(path, columns=columns, **kwargs)
