#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from <outDir>/oracle_sql.json in DuckDB over the sf parquet tables and
diff against the Spark parquet output in <outDir>/<key>/.

Usage: compare_oracle.py <sfDir> <outDir> [key ...]
"""
import json, sys, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and represent exactly
        if v == 0.0:
            return "0.0"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def table(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    types = [str(rel.types[i]) for i in order]
    return [cols[i] for i in order], types, data

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark output")
            n_fail += 1
            continue
        try:
            sc, st, sd = table(con.sql(f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')"))
            oc, ot, od = table(con.sql(sql))
        except Exception as e:
            print(f"FAIL {key}: {e}")
            n_fail += 1
            continue
        problems = []
        if sc != oc:
            problems.append(f"cols spark={sc} oracle={oc}")
        if len(sd) != len(od):
            problems.append(f"rows spark={len(sd)} oracle={len(od)}")
        if sc == oc and len(sd) == len(od) and sd != od:
            for i, (a, b) in enumerate(zip(sd, od)):
                if a != b:
                    problems.append(f"first diff row {i}:\n  spark : {a}\n  oracle: {b}")
                    break
        if st != ot:
            problems.append(f"types(note) spark={st} oracle={ot}")
        hard = [p for p in problems if not p.startswith("types(note)")]
        if hard:
            n_fail += 1
            print(f"FAIL {key}: " + "; ".join(problems))
        else:
            n_pass += 1
            note = "" if not problems else "  [" + problems[0] + "]"
            print(f"PASS {key} ({len(sd)} rows){note}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
