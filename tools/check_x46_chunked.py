#!/usr/bin/env python3
"""Chunked x46 100x oracle replay — closes the BPE-encode cell the
one-shot form cannot reach (see BASELINE.md SCALE CORRECTNESS, round 13).

Why this exists: the one-shot x46 oracle OOMs in DuckDB at 500k docs
(documented attempts: 16t/80GB, 4t/100GB, 2t/110GB — "bad allocation")
because the per-doc encode — explode every document into word instances,
re-assemble the id CSV per doc, then CRC-fold a list of one BIGINT per
character of that CSV — is list-aggregation-bound and non-spillable.
But the TRAINED state is tiny and corpus-global (the 10-step merge
chain reduces to a vocabulary-sized word -> (ids, n) table: 3,100 rows
at 100x, materialized in under a second), and a document's encode
depends on NOTHING outside the document. So the replay materializes the
training prefix ONCE into an on-disk table and runs the doc-side encode
in doc_id % N chunk passes — exactly the d2 chunked-signature protocol.

The script does NOT re-state the oracle: it textually splits the exact
`oracle_sql.json` x46 entry at the `docw` CTE boundary and injects only
the chunk predicate into the two documents scans downstream of the
split, so the replayed SQL is the driver's oracle verbatim, chunk-gated.
Compare protocol identical to check_scale.py: columns sorted by name,
rows sorted by all columns, exact value compare.

  python3 tools/check_x46_chunked.py <sliceDir> <verifyOutDir> <outJson>

Knobs: X46_CHUNKS (default 20), DUCKDB_THREADS, DUCKDB_MEMORY_LIMIT.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

slice_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
chunks = int(os.environ.get("X46_CHUNKS", "20"))

DOCW_MARKER = "docw AS ("
DOCW_SRC = "FROM documents),"
IDS_SRC = "FROM documents d LEFT JOIN perdoc p USING (doc_id))"

sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))["x46_bpe_encode"]
assert DOCW_MARKER in sql, "x46 oracle no longer matches the docw split point"
prefix, rest = sql.split(DOCW_MARKER, 1)
rest = DOCW_MARKER + rest
assert rest.count(DOCW_SRC) == 1, "expected one documents scan in docw"
assert rest.count(IDS_SRC) == 1, "expected one documents scan in ids"
# the ct CTE (CRC table literal) sits in the prefix but is consumed by the
# final SELECT downstream of the split — carry it into every chunk pass
ct_start = prefix.index("ct AS (SELECT [")
ct_end = prefix.index("] AS tbl)", ct_start) + len("] AS tbl)")
ct_cte = prefix[ct_start:ct_end]
train_prefix = (prefix[:ct_start] + prefix[ct_end:]).rstrip().rstrip(",")
# drop the now-dangling comma pair left where ct was cut
train_prefix = train_prefix.replace(",\n,", ",")
# the comma surgery assumes ct is neither WITH's first CTE nor separated
# by an unexpected whitespace shape — fail HERE with a clear message if
# the oracle's formatting ever drifts, not with a DuckDB parse error
# mid-run
assert "WITH ," not in train_prefix and ",," not in train_prefix, \
    "x46 oracle formatting drifted: ct-CTE comma surgery left invalid SQL"

db_path = "/tmp/x46_chunked.duckdb"
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

# phase 1 — the trained word table, ONCE (vocabulary-sized)
con.execute("CREATE OR REPLACE TABLE wids_tbl AS "
            + train_prefix + " SELECT wd, idstr, n FROM wids")
nw = con.execute("SELECT count(*) FROM wids_tbl").fetchone()[0]
print(f"[x46-chunked] trained word table materialized: {nw} rows", flush=True)
con.execute("CHECKPOINT")

# phase 2 — the per-doc encode, chunk-gated on both documents scans
parts = []
for i in range(chunks):
    chunk_sql = (
        "WITH " + ct_cte + ",\n"
        + "wids AS (SELECT wd, idstr, n FROM wids_tbl),\n"
        + rest
          .replace(DOCW_SRC, f"FROM documents WHERE doc_id % {chunks} = {i}),")
          .replace(IDS_SRC,
                   f"FROM documents d LEFT JOIN perdoc p USING (doc_id) "
                   f"WHERE d.doc_id % {chunks} = {i})"))
    parts.append(con.execute(chunk_sql).df())
    print(f"[x46-chunked] chunk {i + 1}/{chunks} done, "
          f"{sum(len(p) for p in parts)} rows", flush=True)
want = pd.concat(parts, ignore_index=True)

entry = {"rows_match": False, "schema_match": False, "hash_match": False,
         "spark_rows": None, "oracle_rows": None, "err": None,
         "protocol": f"chunked encode replay, {chunks} doc_id%N passes over "
                     "the once-materialized trained word table "
                     "(tools/check_x46_chunked.py)"}
spark_files = glob.glob(os.path.join(out_dir, "x46_bpe_encode", "*.parquet"))
if not spark_files:
    entry["err"] = "no spark output"
else:
    got = con.execute(f"SELECT * FROM read_parquet({spark_files!r})").df()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    entry["spark_rows"] = int(len(got))
    entry["oracle_rows"] = int(len(want))
    if list(got.columns) != list(want.columns):
        entry["err"] = f"cols {list(got.columns)} != {list(want.columns)}"
    elif len(got) != len(want):
        entry["rows_match"] = False
        entry["err"] = "row count mismatch"
    else:
        entry["rows_match"] = True
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        schema_ok = all(str(g[c].dtype) == str(w[c].dtype) for c in g.columns)
        entry["schema_match"] = bool(schema_ok)
        bad = None
        for c in g.columns:
            eq = (g[c] == w[c]) | (g[c].isna() & w[c].isna())
            if not eq.all():
                bad = f"value[{c}]: {int((~eq).sum())} diffs"
                break
        entry["hash_match"] = bad is None and schema_ok
        if bad:
            entry["err"] = bad

report = {"x46_bpe_encode": entry}
with open(out_json, "w") as f:
    json.dump(report, f, indent=1, sort_keys=True)
print(f"[x46-chunked] {'green' if entry['hash_match'] else 'RED'} -> {out_json}")
sys.exit(0 if entry["hash_match"] else 1)
