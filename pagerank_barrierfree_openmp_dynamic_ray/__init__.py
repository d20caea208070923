"""Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the capabilities of
puzzlef/pagerank-barrierfree-openmp-dynamic (reference at /root/reference,
cited as ``file:line`` throughout) on top of ``ray.data.Dataset`` pipelines:

- web pages (Parquet: url, warc_ts, html, text, lang) -> link extraction via
  ``map_batches`` over zero-copy Arrow batches,
- url -> dense vertex-id assignment (sort + per-block offsets), edge dedup,
  self-loop union (reference ``main.cxx:240``), out-degree aggregation,
- hash-partitioned per-partition CSR blocks pinned in an actor pool,
- PageRank in all six reference modes (with-barrier / barrier-free x
  static / naive-dynamic / dynamic-frontier; ``main.cxx:209-225``),
- connected components, label propagation, triangle count,
- per-iteration checkpoints with lineage metadata, resumable mid-convergence,
- training-data pipeline operators (dedup families, similarity search, text
  analysis, multimodal plumbing) over document/embedding tables.

Nothing here calls ``ray.init``/``ray.shutdown``; session ownership belongs to
the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
