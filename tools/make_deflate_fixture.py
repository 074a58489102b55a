#!/usr/bin/env python3
"""Regenerate the q_compress_ratio golden fixture.

The oracle pins ONLY the non-SQL-expressible part of the compress-ratio
screen: the DEFLATE (level 6, zlib wrapper) byte count per document.
Python's zlib is an independent driver of the same codec as the JDK
Deflater and produces bit-identical stream lengths (verified for the
whole sf0.01 corpus in round 8).

The fixture is keyed by md5(text) — NOT by doc_id — so one committed
file is valid for every scale factor (the sf0.001 and sf0.01 corpora
share doc_id ranges but have different text; a doc_id-keyed fixture was
only ever valid at the SF it was generated from, found in round 15).
NULL text hashes as the empty string (the operator treats both as empty
bytes, ratio 1.0).

Re-run this WHENEVER /root/testdata is regenerated (the driver has done
so between rounds — see NOTES.md):

    python3 tools/make_deflate_fixture.py [sf_dir ...] [--out parquet]

Defaults: /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1
          → src/test/resources/golden/deflate_sizes_by_md5.parquet
"""
import sys, zlib, hashlib
import duckdb
import pandas as pd

argv = list(sys.argv[1:])
out = "src/test/resources/golden/deflate_sizes_by_md5.parquet"
if "--out" in argv:
    i = argv.index("--out")
    out = argv[i + 1]
    del argv[i:i + 2]
sfs = argv or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"]

seen = {}
for sf in sfs:
    docs = duckdb.sql(
        f"SELECT text FROM '{sf}/documents.parquet'").df()
    for r in docs.itertuples():
        raw = (r.text or "").encode("utf-8")
        key = hashlib.md5(raw).hexdigest()
        n = len(zlib.compress(raw, 6)) if raw else 0
        prev = seen.setdefault(key, n)
        assert prev == n, f"md5 collision with differing deflate size: {key}"
g = pd.DataFrame(sorted(seen.items()), columns=["text_md5", "n_deflate"])
g = g.astype({"text_md5": "str", "n_deflate": "int64"})
g.to_parquet(out, index=False)
print(f"{len(g)} rows ({len(sfs)} corpora) -> {out}")
