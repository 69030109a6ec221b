#!/bin/bash
# Round-4 queue D: the re-record legs with the round-4 perf work in
# (overflow dedup, CC knobs from the band_profile sweep, heal cross-edge
# compaction): 2e6 cold/warm, at-scale quality (re-run after the collision
# kill), 1e7 cold/warm, bench.py, SSP exact-backend comparison.
set -u
cd /root/repo

echo "$(date) r4d: leg1 2e6 re-record" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/bigcloud_partition.py --sizes 2000000 \
  --out bigcloud_2e6_r4.json > /tmp/r4_2e6.log 2>&1
echo "$(date) r4d: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4d: leg2 atscale quality" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/partition_quality_atscale.py --n 2000000 \
  > /tmp/r4_atscale.log 2>&1
echo "$(date) r4d: leg2 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4d: leg3 1e7 re-record" >> /tmp/tpuq_status.log
timeout 4200 python -u tools/bigcloud_partition.py --sizes 10000000 \
  --out bigcloud_1e7_r4.json > /tmp/r4_1e7.log 2>&1
echo "$(date) r4d: leg3 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4d: leg4 bench.py" >> /tmp/tpuq_status.log
timeout 3600 python -u bench.py > /tmp/r4_bench.log 2>&1
echo "$(date) r4d: leg4 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4d: leg5 ssp exact backend" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/ssp_quality_smoke.py --cp_backend exact \
  --out ssp_quality_exact_results.json > /tmp/r4_ssp_exact.log 2>&1
echo "$(date) r4d: leg5 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r4d: done" >> /tmp/tpuq_status.log
