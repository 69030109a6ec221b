#!/bin/bash
# Round-4 queue A: (1) 2e6 giant-path A/B with 2^20 Morton chunks (the
# narrow-band geometry's stated payoff — half the chunks, half the
# latency-bound CC-round overhead), (2) persistent-cache cold-start
# diagnosis, (3) 2e6 re-baseline at 2^19 chunks with the same tree.
set -u
cd /root/repo

echo "$(date) r4a: leg1 bigcloud 2e6 chunk=2^20" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --chunk_points 1048576 --out bigcloud_2e6_cp20.json \
  > /tmp/r4_cp20.log 2>&1
echo "$(date) r4a: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4a: leg2 cache_diag" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/cache_diag.py --n 500000 \
  > /tmp/r4_cachediag.log 2>&1
echo "$(date) r4a: leg2 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4a: leg3 bigcloud 2e6 chunk=2^19 (re-baseline)" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --chunk_points 524288 --out bigcloud_2e6_cp19.json \
  > /tmp/r4_cp19.log 2>&1
echo "$(date) r4a: leg3 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r4a: done" >> /tmp/tpuq_status.log
