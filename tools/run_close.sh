#!/bin/bash
# Round-20 closing record: both-SF full verify, plans dump + plan-police
# classification, full bench (headline = per-line min-of-two), quiet-run
# bench artifact.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=8
rm -rf target/close_v001 target/close_v01
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/close_v001" > target/close_verify001.log 2>&1
python3 tools/check.py /root/testdata/sf0.01 target/close_v001 > target/close_check001.log 2>&1
tail -2 target/close_check001.log
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 target/close_v01" > target/close_verify01.log 2>&1
python3 tools/check.py /root/testdata/sf0.1 target/close_v01 > target/close_check01.log 2>&1
tail -2 target/close_check01.log
GITHEAD=$(git rev-parse --short HEAD)
{ echo "# plans_raw.txt — formatted physical plans of every declared query (sf0.001, local[4])"
  echo "# generated at commit $GITHEAD + round-20 final working tree (regenerate with: sbt 'runMain graft.tools.Explain' — see docs/PLANS.md)"
  sbt -batch "runMain graft.tools.Explain" 2>&1
} > docs/plans_raw.txt
grep -c "^======== " docs/plans_raw.txt
grep -c "CartesianProduct" docs/plans_raw.txt
# The PINNED invariant (round-20, VERDICT item 5): SinglePartition
# exchanges are allowed ONLY as keyless-aggregate final merges — the
# classifier line must report suspect=0 (meaningful under either
# explain mode, unlike the old raw grep which the formatted dump
# trivially satisfied).
grep "^\[plan-police\]" docs/plans_raw.txt
grep -q "suspect=0 \[\]" docs/plans_raw.txt || echo "PLAN_POLICE_VIOLATION"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Bench" > target/close_bench.log 2>&1
grep '{"metric"' target/close_bench.log | tail -1
# Quiet-run bench as a first-class machine-readable artifact (round-20,
# VERDICT item 3): BENCH_FULL.json is written by the Bench main itself;
# snapshot it under a round-stamped name so round-over-round comparisons
# stop depending on SCALING.md prose.
cp BENCH_FULL.json BENCH_QUIET_r20.json
echo CLOSE_DONE
