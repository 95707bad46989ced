#!/usr/bin/env python3
"""Build the >=100k-doc fixture for the banded-LSH WIDENED-path spot
check (round-17, VERDICT item 7): 24 shifted replicas of the sf0.1
documents table -> 120,000 docs, past the 2^16 = 65,536 bucket capacity
of the mm5/mm7 16-bit bands, so BandedLsh.hammingPairs derives
widenFactor w=2 and the 32-bit concatenated-band path actually RUNS
(every prior fixture sat under capacity and took the w=1 short-circuit).

Same replication scheme as gen_sf1.py's documents table (doc_id offset
per replica; text kept so groups-of-8 stay intact within a replica).
Output: /root/repo/target/sf2w/documents.parquet. Measurement-only:
the oracle gate never reads it.
"""
import duckdb, os

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/target/sf2w"
REPS = 24
os.makedirs(DST, exist_ok=True)

con = duckdb.connect()
# Replica-stride guard (round-20, VERDICT item 6)
_mx = con.sql(f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0]
assert _mx < 10000, f"doc_id {_mx} >= replica stride 10000"
out = f"{DST}/documents.parquet"
con.execute(f"""
  COPY (
    SELECT doc_id + r.i * 10000 AS doc_id, text, lang, source, n_chars
    FROM '{SRC}/documents.parquet', range(0, {REPS}) r(i)
    ORDER BY doc_id
  ) TO '{out}' (FORMAT PARQUET)""")
n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
assert n > 65536, n
print("documents", n, "->", out)
