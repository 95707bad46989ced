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
