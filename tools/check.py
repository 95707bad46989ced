#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT shipped engine code).

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
same sf parquet tables, loads the Spark-written parquet result, and
compares: row count, column set, and value-hash with rows sorted by all
columns and columns sorted by name (the strictest plausible driver
compare). Floats are compared exactly (queries already round), with a
1e-9 fallback tolerance report so near-misses are diagnosable.

Usage: python3 tools/check.py <sfdir> <outdir>
"""
import sys, os, json, math, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns ints for stable comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[ns]").astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cmp(name, spark_df, duck_df):
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # DTYPE-STRICT (round-11): the driver's hash is dtype-sensitive at
        # the int-vs-float level (q12 r9, km1 r10 both shipped red because
        # this gate silently coerced). An int column on one side and a
        # float column on the other is a FAILURE, not a coercion.
        ak = "i" if av.dtype.kind in "iu" else av.dtype.kind
        bk = "i" if bv.dtype.kind in "iu" else bv.dtype.kind
        if {ak, bk} == {"i", "f"}:
            problems.append(
                f"col {c}: DTYPE mismatch spark={av.dtype} duck={bv.dtype}"
                " (int vs float — driver hash WILL fail; CAST the oracle)")
            continue
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64")
            bv = bv.astype("float64")
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                mx = (av[neq] - bv[neq]).abs().max()
                n = int(neq.sum())
                problems.append(f"col {c}: {n} mismatches, max abs diff {mx:.3e}"
                                f" sample spark={av[neq].iloc[0]} duck={bv[neq].iloc[0]}")
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                problems.append(f"col {c}: {int(neq.sum())} mismatches, "
                                f"sample spark={av[neq].iloc[0]!r} duck={bv[neq].iloc[0]!r}")
    return problems


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    declared = [d for d in sorted(os.listdir(outdir))
                if os.path.isdir(f"{outdir}/{d}")]
    npass = nfail = 0
    timings = {}
    outcome = {}
    for name in declared:
        spark_df = pd.read_parquet(f"{outdir}/{name}")
        if name not in oracle:
            ok = len(spark_df) > 0
            outcome[name] = "rows_only" if ok else "rows_only_EMPTY"
            print(f"  [rows-only] {name}: {len(spark_df)} rows "
                  f"{'OK' if ok else 'EMPTY!'}")
            continue
        t0 = time.time()
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL error: {e}")
            outcome[name] = "oracle_error"
            nfail += 1
            continue
        timings[name] = round(time.time() - t0, 2)
        problems = cmp(name, spark_df, duck_df)
        if problems:
            print(f"✗ {name}:")
            for p in problems:
                print(f"    {p}")
            outcome[name] = "fail"
            nfail += 1
        else:
            print(f"✓ {name} ({len(spark_df)} rows, {timings[name]:.2f}s oracle)")
            outcome[name] = "pass"
            npass += 1
    with open(f"{outdir}/oracle_timings.json", "w") as f:
        json.dump(timings, f)
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print("slowest oracles: " + ", ".join(f"{k}={v}s" for k, v in slow))
    missing = set(oracle) - set(declared)
    for m in sorted(missing):
        print(f"✗ {m}: oracle declared but no spark output written")
        outcome[m] = "missing_output"
        nfail += 1
    # Builder's self-sweep record (round-19, VERDICT item 1): committed
    # to the repo as CORRECTNESS_SELF_r{N}.json so an empty driver
    # correctness file is self-evidently a harness failure, not an
    # engine one. import-free summary: per-query outcome + totals.
    with open(f"{outdir}/self_correctness.json", "w") as f:
        json.dump({"sfdir": sfdir, "pass": npass, "fail": nfail,
                   "rows_only": sum(1 for v in outcome.values()
                                    if v.startswith("rows_only")),
                   "oracle_sec": round(sum(timings.values()), 1),
                   "queries": outcome}, f, indent=0, sort_keys=True)
    print(f"\n{npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
