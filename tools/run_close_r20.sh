#!/bin/bash
# Round-20 full closing record: sbt test -> run_close.sh (both-SF verify,
# plans+police, full bench, quiet artifact). Serialized: one sbt at a time.
set -x
cd /root/repo
sbt -batch test > target/close_test.log 2>&1
grep -E "Tests: succeeded|TESTS FAILED|error" target/close_test.log | tail -3
bash tools/run_close.sh
