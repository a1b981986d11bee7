#!/usr/bin/env python3
"""Chunked d2 100x oracle replay — closes the one red CORRECTNESS_scale100
cell (see VERDICT r10 item 4).

Why this exists: the one-shot d2 oracle SQL OOMs in DuckDB at 500k docs
(three documented attempts: 32t, 8t/90GB, 4t/115GB) because the minhash
signature build — per-token char-fold hashes through 5 mix stages x 32
permutations into a `list(v ORDER BY j)` per doc — is a non-spillable
list aggregation. But a document's signature depends on NOTHING outside
the document, so splitting the signature stage by `doc_id % N` and
materializing each chunk into an on-disk table is EXACTLY equivalent:
the pair/estimate stages then run once over the materialized signatures
(joins and distincts, which DuckDB can spill).

The script does NOT re-state the oracle: it textually splits the exact
`oracle_sql.json` d2 entry at the `sig` CTE boundary and injects only
the chunk predicate into the `documents` scan, so the replayed SQL is
the driver's oracle verbatim, chunk-gated. Compare protocol identical
to check_scale.py: columns sorted by name, rows sorted by all columns,
exact value compare.

  python3 tools/check_d2_chunked.py <sliceDir> <verifyOutDir> <outJson>

Knobs: D2_CHUNKS (default 20), DUCKDB_THREADS, DUCKDB_MEMORY_LIMIT.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

slice_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
chunks = int(os.environ.get("D2_CHUNKS", "20"))

SIG_MARKER = ("sig AS (SELECT doc_id, list(v ORDER BY j) AS sig "
              "FROM sigs GROUP BY doc_id),")
SRC_MARKER = "FROM documents)"

sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))["d2_minhash_lsh"]
assert SIG_MARKER in sql, "d2 oracle no longer matches the sig-CTE split point"
prefix, rest = sql.split(SIG_MARKER, 1)
assert prefix.count(SRC_MARKER) == 1, \
    "expected exactly one documents scan upstream of the sig CTE"

# on-disk database: the materialized signature table must not be
# memory-resident while the pair stage runs
db_path = "/tmp/d2_chunked.duckdb"
for p in (db_path, db_path + ".wal"):
    if os.path.exists(p):
        os.remove(p)
con = duckdb.connect(db_path)
os.makedirs("/tmp/duckspill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duckspill'")
con.execute("SET preserve_insertion_order=false")
if os.environ.get("DUCKDB_THREADS"):
    con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
if os.environ.get("DUCKDB_MEMORY_LIMIT"):
    con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMORY_LIMIT']}'")
doc = os.path.join(slice_dir, "documents.parquet")
doc_src = os.path.join(doc, "*.parquet") if os.path.isdir(doc) else doc
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_src}')")

con.execute("CREATE OR REPLACE TABLE sig_tbl(doc_id BIGINT, sig BIGINT[])")
for i in range(chunks):
    chunk_sql = (
        "INSERT INTO sig_tbl "
        + prefix.replace(SRC_MARKER, f"FROM documents WHERE doc_id % {chunks} = {i})")
        + "sig AS (SELECT doc_id, list(v ORDER BY j) AS sig "
          "FROM sigs GROUP BY doc_id) SELECT doc_id, sig FROM sig")
    con.execute(chunk_sql)
    n = con.execute("SELECT count(*) FROM sig_tbl").fetchone()[0]
    print(f"[d2-chunked] chunk {i + 1}/{chunks} done, {n} signatures", flush=True)
con.execute("CHECKPOINT")

want_sql = "WITH sig AS (SELECT doc_id, sig FROM sig_tbl)," + rest
entry = {"rows_match": False, "schema_match": False, "hash_match": False,
         "spark_rows": None, "oracle_rows": None, "err": None,
         "protocol": f"chunked signature replay, {chunks} doc_id%N passes "
                     "(tools/check_d2_chunked.py)"}
spark_files = glob.glob(os.path.join(out_dir, "d2_minhash_lsh", "*.parquet"))
if not spark_files:
    entry["err"] = "no spark output"
else:
    got = con.execute(f"SELECT * FROM read_parquet({spark_files!r})").df()
    want = con.execute(want_sql).df()
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
                msgs.append(f"value[{c}] row{bad}: {g[c][bad]!r} != "
                            f"{w[c][bad]!r} ({int((~eq).sum())} diffs)")
        entry["hash_match"] = exact
    if msgs:
        entry["err"] = "; ".join(msgs)

ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
with open(out_json, "w") as f:
    json.dump({"d2_minhash_lsh": entry}, f, indent=1, sort_keys=True)
print(f"[{'OK  ' if ok else 'FAIL'}] d2_minhash_lsh "
      f"({entry['oracle_rows']} rows)"
      + ("  " + entry["err"] if entry["err"] else ""))
sys.exit(0 if ok else 1)
