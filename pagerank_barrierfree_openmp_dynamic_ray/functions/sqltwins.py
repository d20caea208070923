"""DuckDB oracle-SQL builders for the iterative / derived-payload queries.

The driver's correctness gate runs each ``queries()`` pipeline next to an
ANSI-SQL twin.  DuckDB 1.0 has no keyed recursion (``USING KEY``), and a
naive recursive CTE for label/rank fixpoints enumerates the transitive
closure (quadratic in component size), so the iterative twins here are
UNROLLED sweep chains instead: stage ``s{i}`` is one MATERIALIZED CTE
computing sweep ``i`` from ``s{i-1}`` with exactly the engine's update rule
(`src/pagerankBasic.hxx:53-68` superstep semantics).  MATERIALIZED matters:
each stage references its predecessor twice-ish, and DuckDB would otherwise
inline the chain into an exponentially growing expression tree.

Termination mirrors the engine per algorithm:
- CC (min-label) is monotone — extra sweeps are no-ops, so any unroll count
  >= the convergence sweep count is exact.
- LP runs exactly ``max_iter`` sweeps (early-converged state is stable, so
  the fixed unroll equals the engine's early stop).
- PageRank stops at the FIRST sweep whose L-inf residual < tol — the twin
  tags every stage, computes per-stage residuals, and selects the matching
  stage, reproducing the engine's stopping rule (not just its fixed point;
  an extra sweep would move ranks by ~tol/(1-d), visible at 12 decimals).

The mm_* twins regenerate the deterministic payload byte pattern
(stages/multimodal._pattern — pure int64 arithmetic) with BIGINT expressions
and recompute the decoded stats; integer sums stay below 2^53, so the float
means/rms are bit-identical between numpy and DuckDB.
"""

from __future__ import annotations

DAMPING = 0.85
# written as (1.0 - 0.85) because the engine computes c0 = (1.0 - damping)/n
# and 0.15 parses to a double one ulp away from 1.0 - 0.85
C0_NUM = "(1.0 - 0.85)"


def _pr_stage(i: int, V: int, c0_expr: str, acc: str) -> str:
    """One PageRank sweep: rows for ALL vertices (a vertex with no in-edges
    still re-ranks to c0 — pull over an empty segment, csr.pull_all)."""
    return f"""s{i} AS MATERIALIZED (
  SELECT v.vid, {c0_expr} + 0.85 * COALESCE(acc.s, 0) AS r
  FROM allv v LEFT JOIN (
    SELECT e.dst AS vid, SUM({acc}) AS s
    FROM s{i - 1} p JOIN deg ON deg.vid = p.vid JOIN full_e e ON e.src = p.vid
    GROUP BY e.dst) acc ON acc.vid = v.vid)"""


def pagerank_sql(edge_sql: str, V: int, n_sweeps: int, tol: float = 1e-10,
                 weighted: bool = False, dead: bool = False) -> str:
    """Unrolled synchronous PageRank over the derived graph, selecting the
    first sweep with L-inf < tol (engine: pipelines/pagerank.py run(mode=
    "barrier")).  ``weighted``: edges carry w (duplicate links summed,
    self-loops w=1), contributions are (r/wdeg)*w.  ``dead``: the
    add_loops=False layout (natural self-loops kept, no loop injection) with
    teleport redistribution of the previous sweep's dead-end mass
    (``pagerankTeleport``, `src/pagerank.hxx:157-184`)."""
    if weighted and dead:
        raise NotImplementedError("no query uses weighted+dead")
    if dead:
        graph = f"""raw AS ({edge_sql}),
full_e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw),
deg AS MATERIALIZED (SELECT src AS vid, COUNT(*)::DOUBLE AS d
                     FROM full_e GROUP BY src),
allv AS MATERIALIZED (SELECT x.range::BIGINT AS vid FROM range({V}) x),
deadv AS MATERIALIZED (SELECT v.vid FROM allv v
                       WHERE v.vid NOT IN (SELECT vid FROM deg))"""
    elif weighted:
        graph = f"""raw AS ({edge_sql}),
e AS (SELECT src, dst, SUM(w)::DOUBLE AS w FROM raw WHERE src <> dst
      GROUP BY src, dst),
loops AS (SELECT x.range::BIGINT AS v FROM range({V}) x),
full_e AS MATERIALIZED (SELECT src, dst, w FROM e
                        UNION ALL SELECT v, v, 1.0 FROM loops),
deg AS MATERIALIZED (SELECT src AS vid, SUM(w) AS d FROM full_e GROUP BY src),
allv AS MATERIALIZED (SELECT x.range::BIGINT AS vid FROM range({V}) x)"""
    else:
        graph = f"""raw AS ({edge_sql}),
e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
loops AS (SELECT x.range::BIGINT AS v FROM range({V}) x),
full_e AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT v, v FROM loops),
deg AS MATERIALIZED (SELECT src AS vid, COUNT(*)::DOUBLE AS d
                     FROM full_e GROUP BY src),
allv AS MATERIALIZED (SELECT x.range::BIGINT AS vid FROM range({V}) x)"""

    ctes = [graph,
            f"s0 AS MATERIALIZED (SELECT vid, 1.0/{V} AS r FROM allv)"]
    acc = "(p.r / deg.d) * e.w" if weighted else "p.r / deg.d"
    for i in range(1, n_sweeps + 1):
        if dead:
            # the engine folds the PREVIOUS sweep's dead-end mass into C0:
            # c0_t = c0 + damping * dead_total / n  (then + damping * sums)
            ctes.append(
                f"d{i - 1} AS MATERIALIZED (SELECT COALESCE(SUM(p.r), 0) AS m "
                f"FROM s{i - 1} p JOIN deadv ON deadv.vid = p.vid)"
            )
            c0_expr = (f"({C0_NUM}/{V} + 0.85 * ((SELECT m FROM d{i - 1})"
                       f" / {V}))")
        else:
            c0_expr = f"{C0_NUM}/{V}"
        ctes.append(_pr_stage(i, V, c0_expr, acc))
    u = " UNION ALL ".join(
        f"SELECT {i} AS i, vid, r FROM s{i}" for i in range(0, n_sweeps + 1)
    )
    ctes.append(f"u AS MATERIALIZED ({u})")
    ctes.append("""err AS (SELECT a.i, MAX(ABS(a.r - b.r)) AS linf
  FROM u a JOIN u b ON b.vid = a.vid AND b.i = a.i - 1 GROUP BY a.i)""")
    ctes.append(f"stop AS (SELECT MIN(i) AS i FROM err WHERE linf < {tol})")
    # if NO sweep reached the stopping rule the unroll budget (not the
    # engine) is at fault — fail LOUDLY with a single sentinel row instead
    # of silently returning 0 rows
    return ("WITH " + ",\n".join(ctes) +
            "\nSELECT vid, rank FROM ("
            "SELECT vid, ROUND(r, 12) AS rank, r FROM u "
            "WHERE i = (SELECT i FROM stop) "
            "UNION ALL SELECT -1 AS vid, NULL AS rank, NULL AS r "
            "WHERE (SELECT i FROM stop) IS NULL"
            ") ORDER BY r DESC, vid LIMIT 20")


def pagerank_vids_sql(edge_sql: str, V: int, n_sweeps: int,
                      tol: float = 1e-10) -> str:
    """Invariant twin for the ASYNC PageRank surfaces (barrier-free, dynamic
    frontier): the synchronous fixpoint's top-20 **vid set** plus a constant
    ``within_tol = 1``.  The engine-side query returns its async top-20 vids
    (measured stable: the rank gap between positions 20/21 is ~1.1e-6 vs
    ~5.6e-10 async run-to-run noise at sf0.01) and an engine-computed
    ``|async - sync| < 1e-6`` flag per vid — so the hash check asserts both
    set equality with the SQL fixpoint and fixed-point agreement, without
    fighting the 12th-decimal async noise that makes a rank value-hash a coin
    flip.  The unroll-failure sentinel row (vid = -1) maps to within_tol = 0,
    staying loud."""
    inner = pagerank_sql(edge_sql, V, n_sweeps, tol)
    return (f"SELECT vid, CAST(vid >= 0 AS BIGINT) AS within_tol "
            f"FROM ({inner}) t ORDER BY vid")


def _pages_graph_ctes(pages_glob: str, p: str = "") -> str:
    """CTEs reproducing the flagship ingest: anchor extraction from raw html
    (functions/extract._HREF_RE on the synthetic corpus, where every anchor
    is exactly ``<a href="URL">``) and the sorted-url dense vid assignment
    (stages/graph_build.vertex_table: distinct urls over src+dst,
    vid = rank in url sort order).  ``p`` prefixes the CTE names — the twin
    instantiates these both inside the unrolled-PageRank subquery and in the
    outer url-lookup scope, and DuckDB rejects duplicate CTE aliases across
    nested scopes."""
    return f"""{p}pages AS (SELECT url, decode(html) AS h
          FROM read_parquet('{pages_glob}')),
{p}links AS (SELECT url AS src_url,
                 unnest(regexp_extract_all(h, '<a href="([^"]+)">', 1))
                   AS dst_url
          FROM {p}pages),
{p}verts AS MATERIALIZED (
  SELECT url, row_number() OVER (ORDER BY url) - 1 AS vid
  FROM (SELECT DISTINCT url FROM (
        SELECT src_url AS url FROM {p}links
        UNION ALL SELECT dst_url FROM {p}links)))"""


def pages_pagerank_sql(pages_glob: str, V: int, n_sweeps: int) -> str:
    """Full flagship twin: corpus parquet -> regexp link extraction ->
    sorted-url vids -> unrolled static PageRank -> top-20 (url, vid, rank).
    ``V`` must equal the corpus' distinct-url count (the query asserts it
    engine-side, so a corpus drift fails loudly on both sides)."""
    edge_sql = f"""WITH {_pages_graph_ctes(pages_glob)}
SELECT s.vid AS src, d.vid AS dst
FROM links JOIN verts s ON s.url = links.src_url
           JOIN verts d ON d.url = links.dst_url"""
    inner = pagerank_sql(edge_sql, V, n_sweeps)
    return f"""WITH {_pages_graph_ctes(pages_glob, p="o")}
SELECT v.url, t.vid, t.rank
FROM ({inner}) t LEFT JOIN overts v ON v.vid = t.vid"""


def pages_host_graph_sql(pages_glob: str) -> str:
    """Twin of ``functions/extract.host_link_counts`` over the flagship
    corpus: anchor extraction -> host contraction -> top-20 host pairs.
    The ORDER BY makes the LIMIT cut deterministic (count desc, hosts asc)."""
    return f"""WITH pages AS (SELECT url, decode(html) AS h
           FROM read_parquet('{pages_glob}')),
links AS (SELECT url AS src_url,
                 unnest(regexp_extract_all(h, '<a href="([^"]+)">', 1))
                   AS dst_url
          FROM pages),
hl AS (SELECT regexp_extract(src_url, '^https://([^/]+)/', 1) AS src_host,
              regexp_extract(dst_url, '^https://([^/]+)/', 1) AS dst_host
       FROM links)
SELECT src_host, dst_host, COUNT(*) AS n_links
FROM hl GROUP BY src_host, dst_host
ORDER BY n_links DESC, src_host, dst_host LIMIT 20"""


def _sym_graph(edge_sql: str, V: int) -> str:
    """Symmetrized derived graph: distinct non-self edges both ways plus a
    self-loop on every vertex (pipelines/components.symmetric_layout_from)."""
    return f"""raw AS (SELECT src, dst FROM ({edge_sql}) WHERE src <> dst),
sym AS MATERIALIZED (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw
     UNION SELECT x.range::BIGINT, x.range::BIGINT FROM range({V}) x),
s0 AS MATERIALIZED (SELECT x.range::BIGINT AS vid, x.range::BIGINT AS l
                    FROM range({V}) x)"""


def cc_sql(edge_sql: str, V: int, n_sweeps: int) -> str:
    """Min-label fixpoint (LabelEngine.connected_components).  Monotone:
    ``n_sweeps`` only needs to exceed the per-component eccentricity from its
    minimum vid (engine measured 32 sweeps at sf0.01; 64 is 2x headroom).
    The self-loop keeps each vertex's own label in the min.  The
    convergence sentinel compares the last two sweeps, so at least one
    sweep is required."""
    if n_sweeps < 1:
        raise ValueError("cc_sql needs n_sweeps >= 1 (sentinel compares the last two sweeps)")
    ctes = [_sym_graph(edge_sql, V)]
    for i in range(1, n_sweeps + 1):
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT e.dst AS vid, MIN(s{i - 1}.l) AS l "
            f"FROM s{i - 1} JOIN sym e ON e.src = s{i - 1}.vid GROUP BY e.dst)"
        )
    # min-label is monotone, so s_n == s_{n-1} proves the fixpoint; if the
    # last two sweeps still differ the unroll budget was too small — emit a
    # loud sentinel row rather than silently returning unconverged labels
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT vid, l AS component FROM s{n_sweeps} "
            f"UNION ALL SELECT -1 AS vid, -1 AS component WHERE EXISTS ("
            f"SELECT 1 FROM s{n_sweeps} a JOIN s{n_sweeps - 1} b "
            f"ON a.vid = b.vid AND a.l <> b.l) ORDER BY vid")


def lp_sql(edge_sql: str, V: int, n_sweeps: int = 20) -> str:
    """Synchronous label propagation, exactly ``max_iter`` sweeps (engine
    lp_step: most frequent in-neighbor label, ties -> smallest; early
    convergence leaves the state stable, so the fixed unroll matches)."""
    ctes = [_sym_graph(edge_sql, V)]
    for i in range(1, n_sweeps + 1):
        ctes.append(f"""s{i} AS MATERIALIZED (
  SELECT vid, l FROM (
    SELECT e.dst AS vid, s{i - 1}.l AS l, COUNT(*) AS c,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY COUNT(*) DESC, s{i - 1}.l ASC) AS rn
    FROM s{i - 1} JOIN sym e ON e.src = s{i - 1}.vid GROUP BY e.dst, s{i - 1}.l)
  WHERE rn = 1)""")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT vid, l AS label FROM s{n_sweeps} ORDER BY vid")


def simhash_sql(max_hamming: int = 3) -> str:
    """Brute-force SimHash pair twin.  Exact, not approximate: the engine's
    banded candidate generation is COMPLETE for max_hamming < bands
    (pigeonhole — stages/dedup.simhash_pairs), so the pair set equals the
    all-pairs hamming filter.  The token hash is md5-based
    (functions/hashing.token_hash64 = first 8 md5 bytes little-endian), which
    DuckDB exposes as ``md5_number_upper``."""
    # the signature is assembled in SIGNED int64 (bit 63 = int64 min — a
    # left shift to 63 range-errors on BIGINT); xor/bit_count only care
    # about the bit pattern, exactly like the engine's uint64<->int64 view
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents),
th AS MATERIALIZED (
  SELECT doc_id, md5_number_upper(tok) AS h FROM toks),
bits AS (
  SELECT doc_id, b.range AS bit,
         CASE WHEN 2 * SUM(((h >> b.range::UBIGINT) & 1)::BIGINT)
                   - COUNT(*) > 0
              THEN CASE WHEN b.range = 63 THEN (-9223372036854775807 - 1)
                        ELSE (1::BIGINT << b.range) END
              ELSE 0::BIGINT END AS v
  FROM th, range(64) b GROUP BY doc_id, b.range),
sigs AS MATERIALIZED (
  SELECT d.doc_id, COALESCE(s.sig, 0::BIGINT) AS sig
  FROM documents d LEFT JOIN (
    SELECT doc_id, bit_or(v) AS sig FROM bits GROUP BY doc_id
  ) s ON s.doc_id = d.doc_id)
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
"""


def minhash_pairs_sql(threshold: float = 0.5) -> str:
    """Brute-force word-3-shingle Jaccard pair twin for minhash_lsh_pairs.

    The engine emits LSH candidates verified with EXACT Jaccard >= threshold,
    so the twin equals the brute-force pair set whenever banded recall is 1.0
    — verified on this corpus at sf0.001 and sf0.01 (every true pair >=
    threshold shares a band; the planted near-dups sit well above it).  The
    engine hashes shingles (64-bit); the twin compares shingle strings —
    identical set sizes absent collisions, hence identical doubles.  Docs
    with < 3 tokens would be padded engine-side (inexpressible here); the
    corpus has none (asserted empirically at both scales)."""
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tok
  FROM documents
  WHERE len(regexp_extract_all(text, '\S+')) >= 3
),
sh AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tok) - 1),
            i -> tok[i] || chr(1) || tok[i+1] || chr(1) || tok[i+2])) AS s
  FROM t
)
SELECT a.doc_id AS a, b.doc_id AS b,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 9) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}
"""


def _closure_ctes(pairs_sql: str) -> str:
    """Shared CTE prefix: transitive closure of the mirrored ``(a, b)`` pair
    edges, MIN reachable id per endpoint (exactly the engine's min-label CC
    fixpoint) — ends with ``clus(v, cluster_id)``."""
    return f"""
WITH RECURSIVE
mh AS MATERIALIZED (SELECT a, b FROM ({pairs_sql}) z),
edges AS (SELECT a AS v, b AS u FROM mh UNION ALL SELECT b AS v, a AS u FROM mh),
nodes AS (SELECT DISTINCT v FROM edges),
reach(v, u) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT e.v, r.u FROM edges e JOIN reach r ON r.v = e.u
),
clus AS (SELECT v, MIN(u) AS cluster_id FROM reach GROUP BY v)"""


def closure_clusters_sql(pairs_sql: str, table: str, id_col: str) -> str:
    """Recursive-CTE twin of ``stages.dedup.dup_clusters`` over any pair
    query emitting columns ``(a, b)``: every row of ``table`` gets its
    cluster id (itself when unpaired) and a keep flag marking the cluster's
    canonical (smallest-id) member."""
    return f"""{_closure_ctes(pairs_sql)}
SELECT d.{id_col},
       COALESCE(c.cluster_id, d.{id_col}) AS cluster_id,
       CAST(CASE WHEN d.{id_col} = COALESCE(c.cluster_id, d.{id_col})
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM {table} d LEFT JOIN clus c ON c.v = d.{id_col}
ORDER BY d.{id_col}
"""


def leak_split_sql(threshold: float = 0.5, val_ppm: int = 100_000) -> str:
    """Twin of ``stages.sampling.leakage_safe_split`` over the minhash
    cluster structure: split decided by the CLUSTER id's hash bucket (the
    ``hash_sample`` predicate), so near-dup documents always share a side."""
    from ..stages.sampling import sample_sql_predicate

    pred = sample_sql_predicate("(COALESCE(c.cluster_id, d.doc_id))", val_ppm)
    return f"""{_closure_ctes(minhash_pairs_sql(threshold))}
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       CASE WHEN {pred} THEN 'val' ELSE 'train' END AS split
FROM documents d LEFT JOIN clus c ON c.v = d.doc_id
ORDER BY d.doc_id
"""


def dup_clusters_sql(threshold: float = 0.5) -> str:
    """:func:`closure_clusters_sql` over the minhash pair set
    (:func:`minhash_pairs_sql`, itself hash-green)."""
    return closure_clusters_sql(minhash_pairs_sql(threshold),
                                "documents", "doc_id")


EMB_NEAR_DUP_PAIRS_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
"""


def emb_dup_clusters_sql() -> str:
    """:func:`closure_clusters_sql` over the embedding-cosine near-dup pair
    set (the ``emb_near_dup`` twin, hash-green at tau=0.45)."""
    return closure_clusters_sql(EMB_NEAR_DUP_PAIRS_SQL,
                                "embeddings", "vec_id")


# the multimodal payload pattern (stages/multimodal._pattern) as a BIGINT
# expression over a position column i and a per-item seed column
def _pattern_expr(i: str, seed: str, mod: int) -> str:
    return (f"(({i} * {i} * 1103515245 + {i} * 12345 + {seed} * 2654435761)"
            f" % 2147483648) % {mod}")


def mm_image_sql(n: int = 64, target: int = 224) -> str:
    """Regenerates the IMG! payload stats of _q_mm_image_stats: width/height
    from the item formula, mean over the regenerated byte pattern (exact:
    integer sum / count), and ResizeStage's letterbox geometry with the same
    float expression shape (w * (target / max))."""
    v = _pattern_expr("p.range", "i.item_id", 256)
    return f"""
WITH items AS (
  SELECT x.range::BIGINT AS item_id,
         (32 + (x.range % 5) * 16)::BIGINT AS w,
         (24 + (x.range % 7) * 16)::BIGINT AS h
  FROM range({n}) x),
px AS (
  SELECT i.item_id, SUM({v})::DOUBLE / (i.w * i.h) AS mean_pixel
  FROM items i, range(0, 96 * 120) p WHERE p.range < i.w * i.h
  GROUP BY i.item_id, i.w, i.h)
SELECT i.item_id, i.w AS width, i.h AS height,
       ROUND(px.mean_pixel, 9) AS mean_pixel,
       ROUND(i.w * ({target}.0 / GREATEST(i.w, i.h)))::BIGINT AS out_w,
       ROUND(i.h * ({target}.0 / GREATEST(i.w, i.h)))::BIGINT AS out_h
FROM items i JOIN px ON px.item_id = i.item_id
ORDER BY i.item_id
"""


def mm_audio_sql(n: int = 32) -> str:
    """AUD! stats twin: rms = sqrt(sum(v^2)/ns) over the regenerated int16
    pattern (sum of squares < 2^53 -> exact double)."""
    v = _pattern_expr("p.range", "i.item_id", 65536)
    return f"""
WITH items AS (
  SELECT x.range::BIGINT AS item_id,
         (8000 * (1 + x.range % 3))::BIGINT AS sr,
         (4000 * (1 + x.range % 5))::BIGINT AS ns
  FROM range({n}) x),
pcm AS (
  SELECT i.item_id,
         SQRT(SUM(({v} - 32768) * ({v} - 32768))::DOUBLE / i.ns) AS rms
  FROM items i, range(0, 20000) p WHERE p.range < i.ns
  GROUP BY i.item_id, i.ns)
SELECT i.item_id, i.sr AS sample_rate,
       ROUND(i.ns::DOUBLE / i.sr, 9) AS duration_s,
       ROUND(pcm.rms, 9) AS rms
FROM items i JOIN pcm ON pcm.item_id = i.item_id
ORDER BY i.item_id
"""


def mm_frames_sql(n: int = 32, frame_len: int = 64, stride: int = 4) -> str:
    """VID! frame-sample twin: every ``stride``-th frame's mean byte value
    over the regenerated pattern (one row per sampled frame)."""
    v = _pattern_expr(f"(f.frame * {frame_len} + p.range)", "f.item_id", 256)
    max_frames = -(-(8 + 3 * 4) // stride)  # ceil(max nf / stride)
    return f"""
WITH items AS (
  SELECT x.range::BIGINT AS item_id,
         (8 + (x.range % 4) * 4)::BIGINT AS nf
  FROM range({n}) x),
frames AS (
  SELECT i.item_id, (g.range * {stride})::BIGINT AS frame
  FROM items i, range(0, {max_frames}) g WHERE g.range * {stride} < i.nf)
SELECT f.item_id, f.frame,
       ROUND(SUM({v})::DOUBLE / {frame_len}, 9) AS mean_value
FROM frames f, range({frame_len}) p
GROUP BY f.item_id, f.frame
ORDER BY f.item_id, f.frame
"""
