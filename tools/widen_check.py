#!/usr/bin/env python3
"""Hash-check the banded-LSH WIDENED path (round-17, VERDICT item 7).

The declared mm5/mm7 oracles replay the UNWIDENED candidate stage
(16-bit bands), which matches the Spark plan at every gate SF (corpus
< 2^16 -> w=1). On the 120k-doc target/sf2w fixture the skeleton
derives w=2 and candidates come from 32-bit CONCATENATED band pairs
instead — a strictly sparser candidate set, so the unwidened oracle is
the wrong reference there (pairs whose dirty bands straddle both bands
of every group are legitimately dropped: the documented widening
recall price). This checker replays the widening itself: group key
j = band[2j]*65536 + band[2j+1] (the Scala shift-concat, order
significant), candidates from wide-key equality, Hamming verify over
the ORIGINAL bands — and compares the full sorted row set against the
Spark parquet written by graft.Verify on the same fixture.

Usage: python3 tools/widen_check.py <sfdir> <verify_outdir>
"""
import sys, duckdb

MM5_BANDS = """
WITH px AS (
  SELECT d.doc_id, t.j,
    (CAST(('0x' || substr(md5(
        CAST(d.doc_id // 8 AS VARCHAR) || ':' ||
        CAST(t.j AS VARCHAR)), 1, 8)) AS BIGINT) +
     CASE WHEN (t.j // 3) // 18 = d.doc_id % 8
           AND (t.j // 3) % 18 < 2 THEN 97 ELSE 0 END) % 251 AS v
  FROM documents d, range(0, 432) t(j)),
cells AS (
  SELECT doc_id, (j // 3) // 18 AS y, ((j // 3) % 18) // 2 AS cx,
    sum(v) AS p
  FROM px GROUP BY 1, 2, 3),
bts AS (
  SELECT a.doc_id, a.y, a.cx AS x,
    CASE WHEN b.p > a.p THEN 1 ELSE 0 END AS bt
  FROM cells a JOIN cells b
    ON b.doc_id = a.doc_id AND b.y = a.y AND b.cx = a.cx + 1
  WHERE a.cx < 8),
bands AS (
  SELECT doc_id, y // 2 AS k,
    CAST(sum(bt * (1 << (x + 8 * (y % 2)))) AS BIGINT) AS band
  FROM bts GROUP BY 1, 2)
"""

MM7_BANDS = """
WITH fr AS (
  SELECT d.doc_id, t.f,
    CAST(('0x' || substr(md5(
        CAST(d.doc_id // 8 AS VARCHAR) || ':' ||
        CAST(t.f AS VARCHAR)), 1, 8)) AS BIGINT) % 80 + 20 +
    CASE WHEN t.f = d.doc_id % 128 THEN 17 ELSE 0 END AS a
  FROM documents d, range(0, 128) t(f)),
en AS (SELECT doc_id, f, 8 * a * a AS e FROM fr),
bt AS (
  SELECT a.doc_id, a.f,
    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM en a JOIN en b
    ON b.doc_id = a.doc_id AND b.f = a.f + 1
  WHERE a.f < 127),
bands AS (
  SELECT doc_id, f // 16 AS k,
    CAST(sum(bit * (1 << (f % 16))) AS BIGINT) AS band
  FROM bt GROUP BY 1, 2)
"""

TAIL = """
, wbands AS (
  SELECT doc_id, k // 2 AS k2,
    CAST(sum(band * CASE WHEN k % 2 = 0 THEN 65536 ELSE 1 END)
      AS BIGINT) AS wband
  FROM bands GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM wbands a JOIN wbands b
    ON a.k2 = b.k2 AND a.wband = b.wband AND a.doc_id < b.doc_id),
ham AS (
  SELECT c.id_a, c.id_b,
    CAST(sum(bit_count(xor(x.band, y.band))) AS BIGINT) AS hamming
  FROM cand c
  JOIN bands x ON x.doc_id = c.id_a
  JOIN bands y ON y.doc_id = c.id_b AND y.k = x.k
  GROUP BY 1, 2)
SELECT id_a, id_b, hamming, (id_a // 8 = id_b // 8) AS same_group
FROM ham WHERE hamming <= {maxham} ORDER BY id_a, id_b
"""

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{sfdir}/documents.parquet')")
    rc = 0
    for name, bands_sql, maxham in [
            ("mm5_dhash_neardup", MM5_BANDS, 6),
            ("mm7_audio_neardup", MM7_BANDS, 4)]:
        oracle = con.execute(
            bands_sql + TAIL.format(maxham=maxham)).fetchall()
        spark = con.execute(
            f"SELECT id_a, id_b, hamming, same_group "
            f"FROM read_parquet('{outdir}/{name}/*.parquet') "
            f"ORDER BY id_a, id_b").fetchall()
        ok = oracle == spark
        ng = sum(1 for r in oracle if r[3])
        print(f"{'OK' if ok else 'MISMATCH'} {name}: spark={len(spark)} "
              f"widened-oracle={len(oracle)} rows ({ng} same_group)")
        if not ok:
            rc = 1
            so, ss = set(oracle), set(spark)
            for r in sorted(so - ss)[:5]: print("  oracle-only", r)
            for r in sorted(ss - so)[:5]: print("  spark-only ", r)
    sys.exit(rc)

if __name__ == "__main__":
    main()
