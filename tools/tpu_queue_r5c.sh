#!/bin/bash
# Round-5 queue C (post jumps1/rounds24 + morton-ordered async fetch):
# (1) 2e6 re-baseline, (2) at-scale quality receipt with the FINAL chunked
# defaults (region + tol 1e-3 + jumps1 + rounds24) incl. the exact arm,
# (3) 1e7 warm/cold with the same defaults (VERDICT #1: no warm regression
# at 2e6/1e7).
set -u
cd /root/repo

echo "$(date) r5c: leg1 bigcloud 2e6" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --out bigcloud_2e6_r5c.json > /tmp/r5c_big.log 2>&1
echo "$(date) r5c: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5c: leg2 atscale quality (final defaults)" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/partition_quality_atscale.py \
  > /tmp/r5c_quality.log 2>&1
echo "$(date) r5c: leg2 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5c: leg3 bigcloud 1e7" >> /tmp/tpuq_status.log
timeout 5400 python -u tools/bigcloud_partition.py --sizes 10000000 \
  --out bigcloud_1e7_r5.json > /tmp/r5c_1e7.log 2>&1
echo "$(date) r5c: leg3 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r5c: done" >> /tmp/tpuq_status.log
