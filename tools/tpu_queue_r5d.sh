#!/bin/bash
# Round-5 queue D: 1e7 re-record with the round-5 solver defaults
# (region accept + stop_tol + native CC fixes) — VERDICT r4 #1's
# "no warm-time regression at 2e6/1e7" receipt.
set -u
cd /root/repo

while ! grep -q "r5c: done" /tmp/tpuq_status.log 2>/dev/null; do
  sleep 60
done

echo "$(date) r5d: leg1 1e7 re-record" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/bigcloud_partition.py --sizes 10000000 \
  --out bigcloud_1e7_r5.json > /tmp/r5_1e7.log 2>&1
echo "$(date) r5d: leg1 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r5d: done" >> /tmp/tpuq_status.log
