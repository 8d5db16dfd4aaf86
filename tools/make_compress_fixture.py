#!/usr/bin/env python3
"""Regenerate fixtures/compress_ratio_zlib.parquet — the independent oracle
for q_compress_ratio.

DuckDB has no deflate function, so the oracle for the compression-ratio
signal is precomputed here with Python zlib (level 6, the same zlib RFC1950
stream java.util.zip.Deflater(6) emits — byte counts verified identical) and
committed as a fixture keyed by md5(text). The oracle SQL joins documents on
md5(text), so the fixture works at any scale factor whose documents are
included below.

Usage: python3 tools/make_compress_fixture.py
"""
import duckdb, glob, hashlib, zlib

con = duckdb.connect()
rows = {}
for sf in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
    for (text,) in con.execute(f"SELECT text FROM '{sf}'").fetchall():
        raw = text.encode("utf-8")
        key = hashlib.md5(raw).hexdigest()
        if key not in rows:
            rows[key] = (len(raw), len(zlib.compress(raw, 6)))

con.execute("CREATE TABLE fx (text_md5 VARCHAR, n_raw BIGINT, n_deflate BIGINT)")
con.executemany("INSERT INTO fx VALUES (?, ?, ?)",
                [(k, r, d) for k, (r, d) in sorted(rows.items())])
con.execute("COPY fx TO '/root/repo/fixtures/compress_ratio_zlib.parquet' (FORMAT PARQUET)")
print(f"wrote {len(rows)} distinct texts")
