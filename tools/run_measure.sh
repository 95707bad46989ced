#!/bin/bash
# Round-19 measurement run: full Verify at sf0.01 with per-query timings,
# then check.py with per-oracle timings. Builder tooling, not engine code.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8}
OUT=${1:-target/verify_r19_t}
SF=${2:-/root/testdata/sf0.01}
time sbt -batch "runMain graft.Verify $SF $OUT" > target/measure_verify.log 2>&1
echo "verify rc=$?"
time python3 tools/check.py "$SF" "$OUT" > target/measure_check.log 2>&1
echo "check rc=$?"
tail -3 target/measure_check.log
