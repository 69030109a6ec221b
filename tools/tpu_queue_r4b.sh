#!/bin/bash
# Round-4 queue B (waits for queue A): quality receipts on the chip —
# (1) segmentation quality smoke (VERDICT r3 weak-#6: last TPU-backed number
# predates the voxel fix), (2) SSP quality smoke with cp_backend=tpu,
# (3) at-scale partition quality: chunked device path vs exact host solver
# at 2e6 raw + kNN-vs-Delaunay superedge divergence (VERDICT missing-#2).
set -u
cd /root/repo

QP=$(cat /tmp/r4a.pid 2>/dev/null || echo "")
if [ -n "$QP" ]; then
  while kill -0 "$QP" 2>/dev/null; do sleep 30; done
fi
echo "$(date) r4b: start" >> /tmp/tpuq_status.log

echo "$(date) r4b: leg1 quality_smoke (tpu)" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/quality_smoke.py > /tmp/r4_qsmoke.log 2>&1
echo "$(date) r4b: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4b: leg2 ssp_quality_smoke (tpu)" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/ssp_quality_smoke.py > /tmp/r4_ssp.log 2>&1
echo "$(date) r4b: leg2 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4b: leg3 partition_quality_atscale 2e6" >> /tmp/tpuq_status.log
timeout 5400 python -u tools/partition_quality_atscale.py --n 2000000 \
  > /tmp/r4_atscale.log 2>&1
echo "$(date) r4b: leg3 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r4b: done" >> /tmp/tpuq_status.log
