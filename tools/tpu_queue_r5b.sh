#!/bin/bash
# Round-5 queue B: the at-scale quality receipt (leg1 of r5a crashed on a
# circular tool import, fixed). Waits for queue A to release the chip.
set -u
cd /root/repo

while ! grep -q "r5a: done" /tmp/tpuq_status.log 2>/dev/null; do
  sleep 60
done

echo "$(date) r5b: leg1 atscale quality (region default + connectivity)" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/partition_quality_atscale.py --n 2000000 \
  > /tmp/r5_atscale.log 2>&1
echo "$(date) r5b: leg1 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r5b: done" >> /tmp/tpuq_status.log
