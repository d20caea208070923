"""Local emulation of the driver's correctness gate.

Runs ``__ray_entry__.queries()[name](sf_dir)`` and the matching
``oracle_sql()[name]`` over DuckDB views of the same parquet tables, then
compares row count, column-name set, and exact values after sorting columns
by name and rows by every column — the strictest reading of the driver's
"rows + schema + value-hash" check.  Usage:

    python tools/check_oracles.py [query ...]      # default: all with twins
    GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/check_oracles.py pr_top20
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def oracle_df(con, sql: str) -> pd.DataFrame:
    return con.sql(sql).df()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if len(got) != len(want):
        errs.append(f"rows {len(got)} != {len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"schema {sorted(got.columns)} != {sorted(want.columns)}")
        return errs
    g, w = norm(got), norm(want)
    if len(g) == len(w):
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                bad = ~(
                    (a == b) | (pd.isna(a) & pd.isna(b))
                )
                if bad.any():
                    d = np.abs(a - b)
                    rel = d / np.maximum(np.abs(b), 1e-300)
                    tag = ("NEAR(driver-rounds-floats, max rel "
                           f"{np.nanmax(rel):.2e})"
                           if np.nanmax(rel) < 1e-8 else "mismatch")
                    i = int(np.flatnonzero(bad)[0])
                    errs.append(
                        f"col {c}: {int(bad.sum())} {tag}, first at row {i}: "
                        f"{a[i]!r} != {b[i]!r} (maxdiff {np.nanmax(d):.3e})"
                    )
            else:
                bad = a != b
                if bad.any():
                    i = int(np.flatnonzero(bad)[0])
                    errs.append(
                        f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                        f"{a[i]!r} != {b[i]!r}"
                    )
    return errs


def main() -> int:
    import duckdb
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs = entry.queries()
    sqls = entry.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in sqls]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NO SUCH QUERY")
            n_fail += 1
            continue
        t0 = time.perf_counter()
        got = qs[name](sf_dir)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        t1 = time.perf_counter()
        if name not in sqls:
            print(f"{name}: no oracle ({len(got)} rows, ray {t1-t0:.1f}s)")
            continue
        want = oracle_df(con, sqls[name])
        t2 = time.perf_counter()
        errs = compare(name, got, want)
        status = "OK " if not errs else "FAIL"
        print(f"{name}: {status} ({len(got)} rows, ray {t1-t0:.1f}s, "
              f"sql {t2-t1:.1f}s)" + ("" if not errs else " :: " + "; ".join(errs)))
        n_fail += bool(errs)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
