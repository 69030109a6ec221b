#!/bin/bash
# Round-5 queue A: re-record receipts with the new chunked-path defaults
# (accept='region', connectivity relabel, size-aware band geometry), then
# the SURVEY §7.3-3 Delaunay-vs-kNN mIoU A/B (VERDICT r4 next-#3).
set -u
cd /root/repo

echo "$(date) r5a: leg1 atscale quality (region default + connectivity)" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/partition_quality_atscale.py --n 2000000 \
  > /tmp/r5_atscale.log 2>&1
echo "$(date) r5a: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5a: leg2 bench.py (size-aware geometry)" >> /tmp/tpuq_status.log
timeout 3600 python -u bench.py > /tmp/r5_bench.log 2>&1
echo "$(date) r5a: leg2 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5a: leg3 2e6 re-record" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --out bigcloud_2e6_r5.json > /tmp/r5_2e6.log 2>&1
echo "$(date) r5a: leg3 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5a: leg4 quality smoke kNN arm" >> /tmp/tpuq_status.log
timeout 3600 python -u tools/quality_smoke.py --spg_adjacency knn \
  --out quality_smoke_knn_r5.json > /tmp/r5_smoke_knn.log 2>&1
echo "$(date) r5a: leg4 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5a: leg5 quality smoke Delaunay arm" >> /tmp/tpuq_status.log
timeout 3600 python -u tools/quality_smoke.py --spg_adjacency delaunay \
  --out quality_smoke_delaunay_r5.json > /tmp/r5_smoke_del.log 2>&1
echo "$(date) r5a: leg5 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r5a: done" >> /tmp/tpuq_status.log
