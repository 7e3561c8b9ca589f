#!/bin/bash
# Full local gate: compile + tests + sf0.01 oracle check + sf0.1 bench.
# Mirrors everything the driver grades; run before any milestone commit.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile test
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_out"
python3 scripts/check.py /root/testdata/sf0.01 /tmp/gate_out
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${BENCH_CPUS:-32} \
  sbt -batch "runMain graft.Bench" | grep -E '^\{'
