#!/usr/bin/env python3
"""Regenerate the q_compress_ratio golden fixture.

The oracle pins ONLY the non-SQL-expressible part of the compress-ratio
screen: the DEFLATE (level 6, zlib wrapper) byte count per document.
Python's zlib is an independent driver of the same codec as the JDK
Deflater and produces bit-identical stream lengths (verified for the
whole sf0.01 corpus in round 8).

Re-run this WHENEVER /root/testdata is regenerated (the driver has done
so between rounds — see NOTES.md) or the gate's scale factor changes:

    python3 tools/make_deflate_fixture.py [sf_dir] [out_parquet]

Defaults: /root/testdata/sf0.01 →
          src/test/resources/golden/deflate_sizes_sf0.01.parquet
"""
import sys, zlib
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = (sys.argv[2] if len(sys.argv) > 2 else
       "src/test/resources/golden/deflate_sizes_sf0.01.parquet")

docs = duckdb.sql(
    f"SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id").df()
rows = []
for r in docs.itertuples():
    raw = (r.text or "").encode("utf-8")
    rows.append((r.doc_id, len(zlib.compress(raw, 6)) if raw else 0))
g = pd.DataFrame(rows, columns=["doc_id", "n_deflate"]).astype(
    {"doc_id": "int64", "n_deflate": "int64"})
g.to_parquet(out, index=False)
print(f"{len(g)} rows -> {out}")
