#!/bin/bash
# Round-3 queue 3: waits for queue2 (pid in /tmp/queue2.pid), then runs the
# instrumented 2e6 receipt (finds the untimed ~30 s in the CP stage) and the
# geof kernel A/B.
set -u
cd /root/repo

QP=$(cat /tmp/queue2.pid 2>/dev/null || echo "")
if [ -n "$QP" ]; then
  while kill -0 "$QP" 2>/dev/null; do sleep 30; done
fi
echo "$(date) queue2 finished — starting queue3" >> /tmp/tpuq_status.log

echo "$(date) leg: instrumented bigcloud 2e6" >> /tmp/tpuq_status.log
timeout 2400 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --out bigcloud_2e6_instrumented.json > /tmp/tpuq_bigcloud2e6.log 2>&1
echo "$(date) instrumented-2e6 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) leg: geof A/B" >> /tmp/tpuq_status.log
timeout 2400 python -u tools/geof_ab.py --n 2000000 \
  > /tmp/tpuq_geofab.log 2>&1
echo "$(date) geof-ab rc=$?" >> /tmp/tpuq_status.log
echo "$(date) queue3 done" >> /tmp/tpuq_status.log
