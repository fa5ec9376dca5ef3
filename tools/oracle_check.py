#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify via sbt
(caller does that), then compare each outDir/<name> parquet against the
DuckDB result of outDir/oracle_sql.json on the same sf tables.

Usage: python3 tools/oracle_check.py <sfDir> <outDir> [--json <outFile>]

--json writes a per-query machine-readable artifact in the driver's
CORRECTNESS shape ({name: {rows_match, schema_match, hash_match, err}})
so the repo can commit its own correctness signal every round
(CORRECTNESS_LOCAL.json) — round 17's driver artifact arrived empty
and left the round signal-less until a judge re-ran the gate.
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


def main(sf_dir: str, out_dir: str, json_out: str = None) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}

    def record(name, rows=False, schema=False, values=False, err=None,
               spark_rows=None, oracle_rows=None):
        report[name] = {"rows_match": bool(rows), "schema_match": bool(schema),
                        "hash_match": bool(values), "err": err,
                        "spark_rows": spark_rows, "oracle_rows": oracle_rows}

    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            record(name, err=f"spark output missing: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            record(name, err=f"oracle sql error: {str(e)[:200]}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            record(name, rows=(g.shape[0] == w.shape[0]),
                   err=f"columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if g.shape != w.shape:
            print(f"FAIL {name}: shape {g.shape} != {w.shape}")
            record(name, schema=True, err=f"shape {g.shape} != {w.shape}")
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
            record(name, rows=True, schema=True, values=True,
                   spark_rows=len(g), oracle_rows=len(w))
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
            record(name, rows=True, schema=True,
                   err=f"value mismatch {str(diffs[:5])[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail of {n_pass + n_fail}")
    if json_out:
        # mirror the driver artifact's FULL shape: declared rows-only
        # queries (present in the verify output but absent from the
        # oracle map) are recorded as no_oracle with their row count,
        # so the committed twin covers every declared row even when
        # the driver's own artifact arrives empty or truncated
        import os
        for name in sorted(os.listdir(out_dir)):
            p = os.path.join(out_dir, name)
            if not os.path.isdir(p) or name in oracle or name in report:
                continue
            try:
                n_rows = int(len(pd.read_parquet(p)))
            except Exception:
                n_rows = None
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": n_rows,
                            "oracle_rows": None, "err": "no_oracle"}
        with open(json_out, "w") as f:
            json.dump({"n_pass": n_pass, "n_fail": n_fail,
                       "n_total": n_pass + n_fail, "sf_dir": sf_dir,
                       "queries": report}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    args = sys.argv[1:]
    jout = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: oracle_check.py <sfDir> <outDir> [--json <outFile>]")
        jout = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) != 2:
        sys.exit("usage: oracle_check.py <sfDir> <outDir> [--json <outFile>]")
    main(args[0], args[1], jout)
