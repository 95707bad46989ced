#!/usr/bin/env python3
"""Build a 100x scale-up of the RELATIONAL axis (events + orders) for
the round-17 third-decade spot-check of the session's new lines:

  - events:  100 replicas, ts shifted by rep*91 days, event_id offset,
             user_id KEPT — per-user series grow 100x (the w35
             variance-ratio axis: 10M rows, ~6,700 samples per user).
  - orders:  100 replicas, o_orderkey AND o_custkey offset per replica
             — distinct customers grow 100x to 1.5M (the th1/th2 KMV
             axis: the k=256 register claim at a cardinality where
             exact set intersection would shuffle 1.5M keys per
             segment pair).

The documents/embeddings axis deliberately stays at the 10x fixtures
(target/sf1x, sf1z): replicating text 100x inflates duplicate clusters
from the realistic constant size to 100-member cliques, which
quadratically inflates PAIR OUTPUT by construction — that would
measure the fixture, not the operator (gen_sf1.py docstring).

Output: /root/repo/target/sf2x/{events,orders}.parquet. Measurement-
only data: the oracle gate never reads it.
"""
import duckdb, os

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/target/sf2x"
REPS = 100
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

# Replica-stride guard (round-20, VERDICT item 6): ids must fit under
# their replica stride or replicas collide (o_custkey has its own,
# smaller stride — user-scoped joins would silently cross replicas).
for col, table, stride in [("event_id", "events", 10000000),
                           ("o_orderkey", "orders", 10000000),
                           ("o_custkey", "orders", 1000000)]:
    mx = con.sql(f"SELECT max({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    assert mx < stride, f"{table}.{col} {mx} >= replica stride {stride}"

gen("events", f"""
  SELECT event_id + r.i * 10000000 AS event_id,
         ts + to_days(CAST(r.i * 91 AS INT)) AS ts,
         user_id, event_type, value, props
  FROM '{SRC}/events.parquet', range(0, {REPS}) r(i)
  ORDER BY ts""")

gen("orders", f"""
  SELECT o_orderkey + r.i * 10000000 AS o_orderkey,
         o_custkey + r.i * 1000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', range(0, {REPS}) r(i)
  ORDER BY o_orderkey""")
print("done ->", DST)
