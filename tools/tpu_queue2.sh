#!/bin/bash
# Round-3 follow-up queue: waits for the running headline (pid in
# /tmp/headline.pid), then records the bigcloud cold/warm receipts and a
# bench.py sanity run. Each leg logs to /tmp/tpuq_<leg>.log.
set -u
cd /root/repo

HP=$(cat /tmp/headline.pid 2>/dev/null || echo "")
if [ -n "$HP" ]; then
  while kill -0 "$HP" 2>/dev/null; do sleep 30; done
fi
echo "$(date) headline finished — starting follow-ups" >> /tmp/tpuq_status.log

echo "$(date) leg: bigcloud_partition 2e6+1e7 (cold/warm receipts)" >> /tmp/tpuq_status.log
timeout 5400 python -u tools/bigcloud_partition.py --sizes 2000000 10000000 \
  > /tmp/tpuq_bigcloud.log 2>&1
echo "$(date) bigcloud rc=$?" >> /tmp/tpuq_status.log

echo "$(date) leg: bench.py" >> /tmp/tpuq_status.log
timeout 3600 python -u bench.py > /tmp/tpuq_bench.log 2>&1
echo "$(date) bench rc=$?" >> /tmp/tpuq_status.log
echo "$(date) queue2 done" >> /tmp/tpuq_status.log
