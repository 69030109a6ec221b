#!/bin/bash
# Round-5 queue C: stop_tol A/B at 656k voxels, narrow-geometry knob
# profile, 2e6 re-record with the stop_tol default, then a quiet-box bench.
set -u
cd /root/repo

while ! grep -q "r5b: done" /tmp/tpuq_status.log 2>/dev/null; do
  sleep 60
done

echo "$(date) r5c: leg1 stop_tol A/B (656k)" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/atscale_knobs.py \
  --legs chunked,chunked_tol0,chunked_tol3 > /tmp/r5_knobs.log 2>&1
echo "$(date) r5c: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5c: leg2 band_profile (narrow geometry)" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/band_profile.py > /tmp/r5_bandprof.log 2>&1
echo "$(date) r5c: leg2 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5c: leg3 2e6 re-record (stop_tol default)" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --out bigcloud_2e6_r5.json > /tmp/r5_2e6b.log 2>&1
echo "$(date) r5c: leg3 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r5c: leg4 bench.py (quiet box, b16 legs)" >> /tmp/tpuq_status.log
timeout 4200 python -u bench.py > /tmp/r5_bench2.log 2>&1
echo "$(date) r5c: leg4 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r5c: done" >> /tmp/tpuq_status.log
