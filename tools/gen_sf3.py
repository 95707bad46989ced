#!/usr/bin/env python3
"""Build the 100x THIRD DECADE of the documents/embeddings axis
(round-18, VERDICT item 2) — the decade the LLM-pipeline tier (dedup /
ANN / SemDeDup / widened near-dup) had not been measured at: the
relational axis got its 100x fixture in round 17 (gen_sf2.py), but
documents deliberately stayed at 10x because naive replication inflates
duplicate clusters into 100-member cliques and measures the fixture,
not the operator (the gen_sf2.py docstring's hazard).

This generator avoids the hazard by CONTENT-SHIFTING instead of
replicating:

  - documents (500k rows): 100 replicas, each replica r renaming the
    WHOLE VOCABULARY through an injective map w -> md5(w || 'r' || r)
    [8 hex chars]. A bijective rename preserves word-level Jaccard
    (and exact-duplicate identity) WITHIN a replica exactly — so every
    planted dup cluster keeps its source size — while cross-replica
    token spaces are disjoint, so no 100-member cliques appear and
    pair output stays linear in corpus size. n_chars is recomputed
    from the renamed text.

  - embeddings (200k rows): the sf1z Zipf-cluster construction
    (max(1, floor(S/i^1.05)) members per cluster, head ~1.5% of the
    corpus, md5-jittered NEAR-duplicates at within-cluster cosine
    ~0.998) scaled to 100x — the realistic semantic-dup shape for the
    d5/d14*/s17 family at a cardinality where cell-occupancy skew is
    material.

  - events: copied from the 10x fixture (target/sf1x) purely to keep
    ProfileQuery's sfdir contract — no query profiled at this decade
    reads events (the 100x events axis lives in target/sf2x).

Output: /root/repo/target/sf3d/{documents,embeddings,events}.parquet.
Measurement-only data: the oracle gate never reads it. Run AFTER
tools/gen_sf1.py (needs target/sf1x/events.parquet).
"""
import duckdb, os

SRC = "/root/testdata/sf0.1"
SF1X = "/root/repo/target/sf1x"
DST = "/root/repo/target/sf3d"
REPS = 100
os.makedirs(DST, exist_ok=True)

con = duckdb.connect()


def check(table, out, want_rows):
    a = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()
    b = con.sql(f"DESCRIBE SELECT * FROM '{out}'").fetchall()
    assert [(r[0], r[1]) for r in a] == [(r[0], r[1]) for r in b], (table, a, b)
    n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    assert n == want_rows, (table, n, want_rows)
    print(table, n)


# --- documents: 100 content-shifted replicas ------------------------
n_src = con.sql(f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
# replica stride is 10000: ids must fit under it or replicas collide
# silently (the row-count check can't see duplicate doc_ids) — r18 ADVICE
max_id = con.sql(
    f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'").fetchone()[0]
assert max_id < 10000, f"doc_id {max_id} >= replica stride 10000"
out_d = f"{DST}/documents.parquet"
con.execute(f"""
  COPY (
    WITH shifted AS (
      SELECT doc_id + r.i * 10000 AS doc_id,
             array_to_string(list_transform(str_split(text, ' '),
               w -> substr(md5(w || 'r' || r.i), 1, 8)), ' ') AS text,
             lang, source
      FROM '{SRC}/documents.parquet', range(0, {REPS}) r(i))
    SELECT doc_id, text, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM shifted ORDER BY doc_id
  ) TO '{out_d}' (FORMAT PARQUET)""")
check("documents", out_d, n_src * REPS)

# sanity: content-shift preserved in-replica dup clusters and created
# NO cross-replica exact dups — the whole point of the construction
dup_hist = con.sql(f"""
  WITH g AS (SELECT text, count(*) AS c, count(DISTINCT doc_id // 10000) AS reps
             FROM '{out_d}' GROUP BY 1)
  SELECT max(c) AS max_clique, max(reps) AS max_reps_sharing_text FROM g
""").fetchone()
src_max = con.sql(f"""
  SELECT max(c) FROM (SELECT count(*) AS c
                      FROM '{SRC}/documents.parquet' GROUP BY text)
""").fetchone()[0]
assert dup_hist[1] == 1, f"cross-replica exact dup leaked: {dup_hist}"
assert dup_hist[0] == src_max, f"dup clique size changed: {dup_hist[0]} vs {src_max}"
print(f"dup-structure check: max clique {dup_hist[0]} (source {src_max}), "
      f"no text spans replicas")

# --- embeddings: Zipf near-dup clusters at 100x ----------------------
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
out_e = f"{DST}/embeddings.parquet"
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
  ) TO '{out_e}' (FORMAT PARQUET)""")
check("embeddings", out_e, total_e)

# --- events: sfdir-contract copy -------------------------------------
con.execute(f"COPY (SELECT * FROM '{SF1X}/events.parquet') "
            f"TO '{DST}/events.parquet' (FORMAT PARQUET)")
print("done ->", DST)
