#!/usr/bin/env python3
"""Non-ASCII gate for the byte-correct w-family oracles: craft a small
corpus of multi-byte (BMP) documents, dump the engine's w1/w2/w3/w4
frames via graft.Verify, and replay the DuckDB oracles on the same
parquet — every framing length/offset/CRC must hash-match even though
char counts and byte counts now differ on every row.

BMP-only by design: Java String ops count UTF-16 units and DuckDB
length() counts code points, identical for BMP characters; an astral
character would shift the page-synthesis truncation points (a synthesis
convention, not a framing one — see the w1OracleSql scaladoc).

Usage: python3 tools/check_w_nonascii.py  (runs sbt; ~2 min)
"""
import os
import subprocess
import sys

import pandas as pd

BASE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/graft_nonascii_sf"
OUT = "/tmp/graft_nonascii_out"
KEYS = ["w1_warc_ingest", "w2_wet_extract", "w3_warc_files", "w4_warc_gz"]

texts = [
    "café naïve coöperation résumé — la pluie tombée sur les pavés",
    "日本語のテキストが入った文書です。これは完全に非ASCIIの本文。",
    "смесь кириллицы и latin text mixed widths привет мир",
    "ελληνικά γράμματα και μια πρόταση αρκετά μεγάλη για μπλοκ",
    "emoji-free but umlauts überall: Straße, Größe, Füße, Maße",
    "short é",
    "",
    "한국어 문장 하나와 ASCII tail to mix byte widths in one doc",
]
docs = pd.DataFrame({
    "doc_id": range(len(texts)),
    "text": texts,
    "lang": ["en"] * len(texts),
    "source": ["s0"] * len(texts),
    "n_chars": [len(t) for t in texts],
})
os.makedirs(CORPUS, exist_ok=True)
docs.to_parquet(os.path.join(CORPUS, "documents.parquet"), index=False)
# sanity: the corpus must actually exercise the byte != char divergence
assert any(len(t.encode()) != len(t) for t in texts)

print(f"[nonascii] corpus staged at {CORPUS} "
      f"({sum(len(t.encode()) for t in texts)} bytes / "
      f"{sum(len(t) for t in texts)} chars)")
rc = subprocess.call(
    ["sbt", "-batch", f"runMain graft.Verify {CORPUS} {OUT} " + " ".join(KEYS)],
    cwd=BASE, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
if rc != 0:
    print(f"[nonascii] Verify failed rc={rc}")
    sys.exit(rc)
rc = subprocess.call(
    [sys.executable, os.path.join(BASE, "tools", "check_oracle.py"),
     CORPUS, OUT] + KEYS)
sys.exit(rc)
