#!/bin/bash
# Round-5 queue B (post sorted-of / w_intra-reuse / stop_tol-1e-3 /
# deferred-fetch changes): (1) 2e6 re-baseline at the new defaults,
# (2) 2e6 with PAD=512 (E_of halves -> hook/ICM overflow segment ops
# shrink; band memory 1.5x at 2^19 — fine), (3) CC-jump knob sweep at 500k
# narrow, (4) room-path stage profile (device SPG + solve changes),
# (5) full bench.
set -u
cd /root/repo

echo "$(date) r5b: leg1 bigcloud 2e6 defaults" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --out bigcloud_2e6_r5b.json > /tmp/r5b_big.log 2>&1
echo "$(date) r5b: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5b: leg2 bigcloud 2e6 PAD=512" >> /tmp/tpuq_status.log
SPGT_BAND_PAD=512 timeout 3000 python -u tools/bigcloud_partition.py \
  --sizes 2000000 --out bigcloud_2e6_pad512.json > /tmp/r5b_pad512.log 2>&1
echo "$(date) r5b: leg2 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5b: leg3 band knob sweep" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/band_profile.py --n 500000 \
  > /tmp/r5b_knobs.log 2>&1
echo "$(date) r5b: leg3 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5b: leg4 room stage profile" >> /tmp/tpuq_status.log
timeout 1800 python -u tools/partition_profile.py > /tmp/r5b_room.log 2>&1
echo "$(date) r5b: leg4 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5b: leg5 bench" >> /tmp/tpuq_status.log
timeout 5400 python -u bench.py > /tmp/r5b_bench.log 2>&1
echo "$(date) r5b: leg5 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r5b: done" >> /tmp/tpuq_status.log
