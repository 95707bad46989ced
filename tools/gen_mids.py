#!/usr/bin/env python3
"""Mid-similarity pair fixture for the d21 two-table MinHash recall
measurement (round-19, VERDICT item 7). The gate corpora's planted
near-dups are all J >= ~0.9 (both LSH tables catch them; the exact
sweep shows zero pairs in 0.3 <= J < 0.9), so the second table's
recall contribution — the whole point of multi-table LSH, P(catch) =
1-(1-s^r)^b per table — is invisible on them. This fixture plants it:
each sf0.1 document gets ONE variant with a deterministic fraction
p in {6%, 10%, 14%, 18%, 22%} of tokens md5-replaced. A changed token
kills up to 3 covering 3-shingles, so shingle Jaccard lands around
(1-p)^3 / (2 - (1-p)^3) ~ 0.45..0.75 — exactly the band where one
4x4 table recalls ~0.2-0.7 and two tables measurably more.

Output: target/sfmid/documents.parquet (original ids + variants at
id+10000). Measurement-only; the oracle gate never reads it."""
import duckdb, os

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/target/sfmid"
os.makedirs(DST, exist_ok=True)

con = duckdb.connect()
max_id = con.sql(
    f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0]
assert max_id < 10000, max_id
out = f"{DST}/documents.parquet"
con.execute(f"""
  COPY (
    SELECT doc_id, text, lang, source, n_chars
    FROM '{SRC}/documents.parquet'
    UNION ALL
    SELECT doc_id + 10000 AS doc_id,
      array_to_string(list_transform(str_split(text, ' '),
        (w, i) -> CASE WHEN ('0x' || substr(md5(
              CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8)
            )::BIGINT % 100 < 6 + (doc_id % 5) * 4
          THEN substr(md5(w || 'mid'), 1, 6) ELSE w END), ' ') AS text,
      lang, source, CAST(0 AS BIGINT) AS n_chars
    FROM '{SRC}/documents.parquet'
    ORDER BY doc_id
  ) TO '{out}' (FORMAT PARQUET)""")
n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
print("documents", n, "->", out)
