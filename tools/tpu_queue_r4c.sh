#!/bin/bash
# Round-4 queue C (waits for queue B): (1) SSP same-seed exact-CP backend
# comparison (VERDICT weak-#6 BP analysis), (2) 2e6 single-monolith solve
# experiment (chunk_points=2^21 -> one chunk, no merge/heal), (3) 1e7
# cold/warm re-record with the round-4 perf work, (4) bench.py validation.
set -u
cd /root/repo

QP=$(cat /tmp/r4b.pid 2>/dev/null || echo "")
if [ -n "$QP" ]; then
  while kill -0 "$QP" 2>/dev/null; do sleep 30; done
fi
echo "$(date) r4c: start" >> /tmp/tpuq_status.log

echo "$(date) r4c: leg1 ssp exact backend" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/ssp_quality_smoke.py --cp_backend exact \
  --out ssp_quality_exact_results.json > /tmp/r4_ssp_exact.log 2>&1
echo "$(date) r4c: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4c: leg2 2e6 monolith chunk=2^21" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --chunk_points 2097152 --out bigcloud_2e6_cp21.json \
  > /tmp/r4_cp21.log 2>&1
echo "$(date) r4c: leg2 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4c: leg3 1e7 re-record" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/bigcloud_partition.py --sizes 10000000 \
  --chunk_points 1048576 --out bigcloud_1e7_r4.json \
  > /tmp/r4_1e7.log 2>&1
echo "$(date) r4c: leg3 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4c: leg4 bench.py" >> /tmp/tpuq_status.log
timeout 3600 python -u bench.py > /tmp/r4_bench.log 2>&1
echo "$(date) r4c: leg4 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r4c: done" >> /tmp/tpuq_status.log
