#!/bin/bash
# Round-4 queue C: waits for the in-flight SSP leg, then runs the
# measurement legs that gate code decisions — cache_diag v2 (attribute the
# ~200 s cross-process kNN residual) and band_profile (overflow dedup +
# CC hook/jump knob sweep).
set -u
cd /root/repo

until grep -q "wrote .*ssp_quality_results.json" /tmp/r4_ssp.log 2>/dev/null; do
  if ! grep -q "leg2" /tmp/tpuq_status.log; then break; fi
  sleep 20
done
sleep 10
echo "$(date) r4c: start" >> /tmp/tpuq_status.log

echo "$(date) r4c: leg1 cache_diag v2" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/cache_diag.py --n 500000 \
  > /tmp/r4_cachediag2.log 2>&1
echo "$(date) r4c: leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) r4c: leg2 band_profile knobs" >> /tmp/tpuq_status.log
timeout 3000 python -u tools/band_profile.py > /tmp/r4_bandprof.log 2>&1
echo "$(date) r4c: leg2 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) r4c: done" >> /tmp/tpuq_status.log
