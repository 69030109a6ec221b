#!/bin/bash
# Round-5 queue D: (1) 656k quality A/B for stop_tol=3e-3 and halo/16
# (candidate iteration/chunk-count cuts — quality must hold), (2) 2e6
# re-baseline with the in-loop async-copy overlap.
set -u
cd /root/repo

echo "$(date) r5d: leg1 knobs tol3e3+halo16" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/atscale_knobs.py \
  --legs chunked,chunked_tol3e3,chunked_halo16 \
  --out atscale_knobs_r5d.json > /tmp/r5d_knobs.log 2>&1
echo "$(date) r5d: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5d: leg2 bigcloud 2e6" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --out bigcloud_2e6_r5d.json > /tmp/r5d_big.log 2>&1
echo "$(date) r5d: leg2 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r5d: done" >> /tmp/tpuq_status.log
