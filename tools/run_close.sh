#!/bin/bash
# Round-19 closing record: both-SF full verify, plans dump, full bench.
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
  echo "# generated at commit $GITHEAD + round-19 final working tree (regenerate with: sbt 'runMain graft.tools.Explain' — see docs/PLANS.md)"
  sbt -batch "runMain graft.tools.Explain" 2>&1
} > docs/plans_raw.txt
grep -c "^======== " docs/plans_raw.txt
grep -c "CartesianProduct" docs/plans_raw.txt
grep -c "Exchange SinglePartition" docs/plans_raw.txt
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Bench" > target/close_bench.log 2>&1
grep '{"metric"' target/close_bench.log | tail -1
echo CLOSE_DONE
