#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB compare.

Usage: python3 scripts/check.py [sf_dir] [out_dir]

Reads each query result parquet from out_dir (written by `sbt "runMain
graft.Verify <sf_dir> <out_dir>"`), runs the matching oracle SQL from
out_dir/oracle_sql.json in DuckDB over views of the sf_dir parquet tables,
sorts columns by name, and compares row counts, schemas, and values
(exact order AND row-sorted, so we can see if only ordering differs).
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO-OUTPUT"
            continue
        got = pd.read_parquet(qdir)
        if name not in oracle:
            results[name] = f"rows-only ({len(got)} rows)"
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols got={list(got.columns)} exp={list(exp.columns)}")
        if len(got) != len(exp):
            problems.append(f"rowcount got={len(got)} exp={len(exp)}")
        if not problems:
            gs = got.astype(str)
            es = exp.astype(str)
            if gs.values.tolist() == es.values.tolist():
                pass
            else:
                g2 = gs.sort_values(by=list(gs.columns)).values.tolist()
                e2 = es.sort_values(by=list(es.columns)).values.tolist()
                if g2 == e2:
                    problems.append("ORDER-ONLY mismatch")
                else:
                    diffs = [
                        (i, a, b)
                        for i, (a, b) in enumerate(zip(gs.values.tolist(), es.values.tolist()))
                        if a != b
                    ][:3]
                    problems.append(f"VALUES differ, first diffs: {diffs}")
            # dtype check (schema-ish)
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    problems.append(f"dtype {c}: got={got[c].dtype} exp={exp[c].dtype}")
        results[name] = "OK" if not problems else "; ".join(problems)

    for k in oracle:
        if k not in results:
            results[k] = "MISSING-RESULT-DIR"
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for k in sorted(results):
        print(f"{'PASS' if results[k] == 'OK' or results[k].startswith('rows-only') else 'FAIL':4} {k}: {results[k]}")
    print(f"== {n_ok}/{len(results)} green ==")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
