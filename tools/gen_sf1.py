#!/usr/bin/env python3
"""Build a 10x scale-up of the driver's sf0.1 testdata for the one-off
sf1 scale spot-check (round-14, VERDICT item 7). The driver ships no
sf1 directory, so this derives one from sf0.1 the way a bigger
generator would: 10 replicas with shifted keys.

  - events:     ts shifted by rep*91 days (the sf0.1 span is ~90 days),
                event_id offset; user_id KEPT so the user-scoped
                queries (corr graph, per-user state) see 10x-longer
                series — the axis events actually grow on.
  - documents:  doc_id offset per replica; text kept, so dedup sees
                constant-size duplicate clusters (10 copies) — linear
                in n, the realistic dup-cluster shape.
  - embeddings: vec_id offset per replica, vectors kept.

Output: /root/repo/target/sf1x/{events,documents,embeddings}.parquet
(plain single parquet files, same schemas as the source — verified by
the DESCRIBE assertions below). Measurement-only data: the oracle gate
never reads it.
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/target/sf1x"
REPS = 10
os.makedirs(DST, exist_ok=True)

con = duckdb.connect()

def gen(table, sql):
    out = f"{DST}/{table}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    a = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()
    b = con.sql(f"DESCRIBE SELECT * FROM '{out}'").fetchall()
    assert [(r[0], r[1]) for r in a] == [(r[0], r[1]) for r in b], (table, a, b)
    n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(table, n)

# Replica-stride guard (round-20, VERDICT item 6 — the gen_sf3 assert
# extended to every generator sharing the id-offset pattern): source ids
# must fit under their replica stride or replicas collide into the same
# id space and the planted dup/cluster structure silently changes shape.
for col, table, stride in [("event_id", "events", 10000000),
                           ("doc_id", "documents", 10000),
                           ("vec_id", "embeddings", 10000)]:
    mx = con.sql(f"SELECT max({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    assert mx < stride, f"{table}.{col} {mx} >= replica stride {stride}"

gen("events", f"""
  SELECT event_id + r.i * 10000000 AS event_id,
         ts + to_days(CAST(r.i * 91 AS INT)) AS ts,
         user_id, event_type, value, props
  FROM '{SRC}/events.parquet', range(0, {REPS}) r(i)
  ORDER BY ts""")

gen("documents", f"""
  SELECT doc_id + r.i * 10000 AS doc_id, text, lang, source, n_chars
  FROM '{SRC}/documents.parquet', range(0, {REPS}) r(i)
  ORDER BY doc_id""")

gen("embeddings", f"""
  SELECT vec_id + r.i * 10000 AS vec_id, embedding, label
  FROM '{SRC}/embeddings.parquet', range(0, {REPS}) r(i)
  ORDER BY vec_id""")

print("done ->", DST)

# ---------------------------------------------------------------------
# Zipf-skew variant (round-15, VERDICT item 6): the uniform x10 replica
# above is the banded-LSH worst case (every cluster exactly 10), but
# real web corpora have Zipf-distributed duplicate-cluster sizes - a
# few giant clusters and a long singleton tail. This writes a second
# measurement-only documents table at target/sf1z with the same ~50k
# row count but skewed clusters:
#
#   cluster i (1-based) holds max(1, floor(S / i^1.05)) identical
#   copies of source text (i mod 5000), salted with a per-cluster
#   prefix token so texts NEVER collide across clusters; S is
#   calibrated so the head cluster is ~1.5% of the corpus and the
#   total is padded with singletons to exactly 10x the source.
#
# events/embeddings are copied from sf1x (the skew axis is document
# text; the pair-generating lines under test read documents only, and
# a complete table set keeps ProfileQuery's sfdir contract).
DSTZ = "/root/repo/target/sf1z"
os.makedirs(DSTZ, exist_ok=True)

n_src = con.sql(f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
total = n_src * REPS
S = 800.0
sizes = []
acc = 0
i = 1
while acc < total:
    c = max(1, int(S / i ** 1.05))
    if acc + c > total:
        c = total - acc
    sizes.append(c)
    acc += c
    i += 1
print(f"zipf plan: {len(sizes)} clusters, head={sizes[0]}, "
      f"singletons={sum(1 for c in sizes if c == 1)}, total={acc}")
con.execute("CREATE TABLE zplan (cluster BIGINT, csize BIGINT)")
con.executemany("INSERT INTO zplan VALUES (?, ?)",
                list(enumerate(sizes, start=1)))

out = f"{DSTZ}/documents.parquet"
con.execute(f"""
  COPY (
    WITH src AS (
      SELECT row_number() OVER (ORDER BY doc_id) - 1 AS rn, text, lang, source
      FROM '{SRC}/documents.parquet'),
    docs AS (
      SELECT z.cluster, 'zc' || z.cluster || ' ' || s.text AS text,
             s.lang, s.source,
             row_number() OVER (ORDER BY z.cluster, r.i) - 1 AS doc_id
      FROM zplan z
      JOIN src s ON s.rn = z.cluster % {n_src}
      CROSS JOIN range(0, {max(sizes)}) r(i)
      WHERE r.i < z.csize)
    SELECT doc_id, text, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM docs ORDER BY doc_id
  ) TO '{out}' (FORMAT PARQUET)""")
a = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/documents.parquet'").fetchall()
b = con.sql(f"DESCRIBE SELECT * FROM '{out}'").fetchall()
assert [(r[0], r[1]) for r in a] == [(r[0], r[1]) for r in b], (a, b)
nz = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
assert nz == total, (nz, total)
print("documents(zipf)", nz)
con.execute(f"COPY (SELECT * FROM '{DST}/events.parquet') "
            f"TO '{DSTZ}/events.parquet' (FORMAT PARQUET)")

# ---------------------------------------------------------------------
# Embedding-axis Zipf variant (round-16, VERDICT item 4): sf1z used to
# copy the uniform-replica embeddings, so the embedding-space dedup
# family (d5, d14*, mm4, s-tier) had only been measured on clusters of
# exactly 10 identical vectors. Real semantic-dup clusters are (a)
# Zipf-sized and (b) NEAR-duplicates, not byte-copies. Same size law as
# the documents axis (max(1, floor(S/i^1.05)), S chosen so the head
# cluster is ~1.5% of the corpus): cluster i takes source vector
# (i mod n_src) as its base and each member adds deterministic
# md5-derived jitter, amplitude 1e-2 per dim on unit-norm vectors —
# within-cluster cosine ≈ 0.998 (above every query threshold), cross-
# base cosine ~N(0, 1/8) (far below). Row count matches sf1x so the
# 10x ratio comparisons stay apples-to-apples.
n_src_e = con.sql(f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
total_e = n_src_e * REPS
SE = total_e * 0.016
esizes = []
acc = 0
i = 1
while acc < total_e:
    c = max(1, int(SE / i ** 1.05))
    if acc + c > total_e:
        c = total_e - acc
    esizes.append(c)
    acc += c
    i += 1
print(f"zipf embedding plan: {len(esizes)} clusters, head={esizes[0]}, "
      f"singletons={sum(1 for c in esizes if c == 1)}, total={acc}")
con.execute("CREATE TABLE ezplan (cluster BIGINT, csize BIGINT)")
con.executemany("INSERT INTO ezplan VALUES (?, ?)",
                list(enumerate(esizes, start=1)))
oute = f"{DSTZ}/embeddings.parquet"
con.execute(f"""
  COPY (
    WITH src AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn,
             CAST(embedding AS DOUBLE[]) AS v, label
      FROM '{SRC}/embeddings.parquet'),
    mem AS (
      SELECT z.cluster, r.i AS j, s.v, s.label,
             row_number() OVER (ORDER BY z.cluster, r.i) - 1 AS vec_id
      FROM ezplan z
      JOIN src s ON s.rn = z.cluster % {n_src_e}
      CROSS JOIN range(0, {max(esizes)}) r(i)
      WHERE r.i < z.csize)
    SELECT vec_id,
           CAST(list_transform(range(1, 65), k ->
             v[k] + (CAST(('0x' || substr(md5(
                 cluster || ':' || j || ':' || k), 1, 8)) AS BIGINT)
               % 201 - 100) * 1e-4) AS FLOAT[]) AS embedding,
           label
    FROM mem ORDER BY vec_id
  ) TO '{oute}' (FORMAT PARQUET)""")
a = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/embeddings.parquet'").fetchall()
b = con.sql(f"DESCRIBE SELECT * FROM '{oute}'").fetchall()
assert [(r[0], r[1]) for r in a] == [(r[0], r[1]) for r in b], (a, b)
ne = con.sql(f"SELECT count(*) FROM '{oute}'").fetchone()[0]
assert ne == total_e, (ne, total_e)
print("embeddings(zipf)", ne)
print("done ->", DSTZ)
