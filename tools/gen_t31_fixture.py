#!/usr/bin/env python3
"""Generate the t31 DEFLATE fixture the DuckDB oracle reads.

t31 (compressRatio) is deterministic — fixed zlib level 6 over UTF-8
bytes — but DuckDB cannot deflate, so the oracle needs the per-doc
compressed sizes from an INDEPENDENT zlib: python's zlib (verified
length-identical to the JVM Deflater the engine uses — both wrap zlib
with the default strategy). Keyed by (doc_id, md5(text)) so the same
fixture serves every SF generation: the oracle joins documents to the
fixture on both keys, and an unknown corpus fails loudly (row-count
mismatch) instead of silently passing.

Rerun (driver-side python env) if /root/testdata is regenerated:
    python3 tools/gen_t31_fixture.py
"""
import hashlib
import zlib

import duckdb

SFS = ["0.001", "0.01", "0.1"]
OUT = "/root/repo/tools/fixtures/t31_deflate.parquet"

con = duckdb.connect()
seen = {}
for sf in SFS:
    for doc_id, text in con.sql(
            f"SELECT doc_id, text FROM '/root/testdata/sf{sf}/documents.parquet'"
    ).fetchall():
        b = (text or "").encode("utf-8")
        key = (doc_id, hashlib.md5(b).hexdigest())
        seen[key] = (len(b), len(zlib.compress(b, 6)))

con.execute("CREATE TABLE f (doc_id BIGINT, text_md5 VARCHAR, "
            "n_bytes BIGINT, n_deflate BIGINT)")
con.executemany("INSERT INTO f VALUES (?, ?, ?, ?)",
                [(d, m, nb, nd) for (d, m), (nb, nd) in sorted(seen.items())])
con.execute(f"COPY f TO '{OUT}' (FORMAT PARQUET)")
print(f"wrote {len(seen)} rows to {OUT}")
