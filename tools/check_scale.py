#!/usr/bin/env python3
"""Scale-correctness gate: replay the driver's rows/schema/hash protocol
(DuckDB oracle vs graft.Verify parquet output) against a MakeScale slice,
where the parquet "tables" are directories of part files, and write a
CORRECTNESS_SCALE-style JSON artifact.

  python3 tools/check_scale.py <sliceDir> <verifyOutDir> <outJson> [query ...]

Protocol identical to tools/check_oracle.py / the driver's gate: columns
sorted by name, rows sorted by all columns, exact value compare (NaN==NaN).
A float near-miss (max rel err < 1e-9) is recorded in `err` for diagnosis
but still counts as a hash mismatch — the driver would fail it too.
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

slice_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
only = set(sys.argv[4:])

con = duckdb.connect()
# Large-slice oracles (s5's PQ encode materializes ~0.5G intermediate rows
# at 10x) need out-of-core execution: give DuckDB a spill dir and drop the
# insertion-order guarantee (the compare sorts rows anyway). The 100x
# replays additionally need DUCKDB_THREADS / DUCKDB_MEMORY_LIMIT: per-thread
# operator state is what OOMs (non-spillable "bad allocation"), so fewer
# threads + an explicit limit trades wall-clock for completion.
os.makedirs("/tmp/duckspill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckspill'")
con.execute("SET preserve_insertion_order=false")
if os.environ.get("DUCKDB_THREADS"):
    con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
if os.environ.get("DUCKDB_MEMORY_LIMIT"):
    con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
for p in sorted(glob.glob(os.path.join(slice_dir, "*.parquet"))):
    name = os.path.basename(p)[: -len(".parquet")]
    src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
report, fails = {}, 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    entry = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None, "err": None}
    report[name] = entry
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        entry["err"] = "no spark output"
        fails += 1
        print(f"[FAIL] {name}: no spark output")
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet({spark_files!r})").df()
        want = con.execute(sql).df()
    except Exception as e:
        entry["err"] = f"query error: {e}"
        fails += 1
        print(f"[FAIL] {name}: {e}")
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    entry["spark_rows"], entry["oracle_rows"] = len(got), len(want)
    entry["rows_match"] = len(got) == len(want)
    entry["schema_match"] = list(got.columns) == list(want.columns)
    msgs = []
    if not entry["schema_match"]:
        msgs.append(f"cols {list(got.columns)} != {list(want.columns)}")
    elif not entry["rows_match"]:
        msgs.append(f"rows {len(got)} != {len(want)}")
    else:
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        exact = True
        for c in got.columns:
            eq = (g[c] == w[c]) | (g[c].isna() & w[c].isna())
            if not eq.all():
                exact = False
                bad = (~eq).idxmax()
                msg = (f"value[{c}] row{bad}: {g[c][bad]!r} != {w[c][bad]!r} "
                       f"({int((~eq).sum())} diffs)")
                if pd.api.types.is_float_dtype(g[c]) and \
                        pd.api.types.is_float_dtype(w[c]):
                    gv, wv = g[c][~eq].to_numpy(), w[c][~eq].to_numpy()
                    rel = max((abs(a - b) / max(abs(a), abs(b), 1e-300)
                               for a, b in zip(gv, wv)
                               if not (math.isnan(a) and math.isnan(b))),
                              default=0.0)
                    msg += f" max_rel_err={rel:.3e}"
                msgs.append(msg)
        entry["hash_match"] = exact
    if msgs:
        entry["err"] = "; ".join(msgs)
    ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
    fails += 0 if ok else 1
    print(f"[{'OK  ' if ok else 'FAIL'}] {name} ({entry['oracle_rows']} rows)"
          + ("  " + entry["err"] if entry["err"] else ""))

with open(out_json, "w") as f:
    json.dump(report, f, indent=1, sort_keys=True)
print(f"[check-scale] {len(report) - fails}/{len(report)} green -> {out_json}")
sys.exit(1 if fails else 0)
