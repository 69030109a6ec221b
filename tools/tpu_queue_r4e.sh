#!/bin/bash
# Round-4 queue E: band_profile knob sweep (rerun after the staticness fix),
# then a fresh-process cold validation of the knn_vs_db_jit fix, then the
# queue-D re-record legs.
set -u
cd /root/repo

echo "$(date) r4e: leg1 band_profile knobs" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/band_profile.py > /tmp/r4_bandprof.log 2>&1
echo "$(date) r4e: leg1 rc=$?" >> /tmp/tpuq_status.log

# two fresh processes: first pays the one-time knn_vs_db_jit compile and
# caches it, second measures the cross-process cold path users actually see
echo "$(date) r4e: leg2 knn cold validation" >> /tmp/tpuq_status.log
timeout 1200 python -u /tmp/cache_pass4.py > /tmp/r4_knncold_a.log 2>&1
echo "$(date) r4e: leg2a rc=$?" >> /tmp/tpuq_status.log
timeout 1200 python -u /tmp/cache_pass4.py > /tmp/r4_knncold_b.log 2>&1
echo "$(date) r4e: leg2b rc=$?" >> /tmp/tpuq_status.log

bash tools/tpu_queue_r4d.sh
