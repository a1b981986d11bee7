#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and diff. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        print(f"[FAIL] {name}: no spark output")
        fails += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").df()
    want = con.execute(sql).df()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    ok = True
    msgs = []
    if list(got.columns) != list(want.columns):
        ok = False
        msgs.append(f"cols {list(got.columns)} != {list(want.columns)}")
    elif len(got) != len(want):
        ok = False
        msgs.append(f"rows {len(got)} != {len(want)}")
    else:
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        for c in got.columns:
            if str(g[c].dtype) != str(w[c].dtype):
                msgs.append(f"dtype[{c}] {g[c].dtype} != {w[c].dtype}")
            eq = (g[c] == w[c]) | (g[c].isna() & w[c].isna())
            if not eq.all():
                ok = False
                bad = (~eq).idxmax()
                msgs.append(f"value[{c}] row{bad}: {g[c][bad]!r} != {w[c][bad]!r} "
                            f"({(~eq).sum()} diffs)")
    print(f"[{'OK  ' if ok else 'FAIL'}] {name} ({len(want)} rows)"
          + ("  " + "; ".join(msgs) if msgs else ""))
    fails += 0 if ok else 1
sys.exit(1 if fails else 0)
