#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify via sbt
(caller does that), then compare each outDir/<name> parquet against the
DuckDB result of outDir/oracle_sql.json on the same sf tables.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if g.shape != w.shape:
            print(f"FAIL {name}: shape {g.shape} != {w.shape}")
            n_fail += 1
            continue
        dt_mismatch = [(c, str(g[c].dtype), str(w[c].dtype))
                       for c in g.columns if g[c].dtype != w[c].dtype]
        if dt_mismatch:
            print(f"WARN {name}: dtype mismatch {dt_mismatch}")
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError:
            # diagnostics: max numeric diff
            diffs = []
            for c in g.columns:
                if pd.api.types.is_numeric_dtype(g[c]):
                    d = (pd.to_numeric(g[c]) - pd.to_numeric(w[c])).abs().max()
                    if d and d > 0:
                        diffs.append((c, d))
                else:
                    ne = (g[c].astype(str) != w[c].astype(str)).sum()
                    if ne:
                        diffs.append((c, f"{ne} rows differ"))
            print(f"FAIL {name}: value mismatch {diffs[:5]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail of {n_pass + n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
