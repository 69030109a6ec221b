#!/bin/bash
# Round-3 queue 4: waits for the instrumented 2e6 run (pid in /tmp/q1.pid),
# then validates bench.py end-to-end (rewritten this round; the driver
# records its output at round end) and runs the geof kernel A/B.
set -u
cd /root/repo

QP=$(cat /tmp/q1.pid 2>/dev/null || echo "")
if [ -n "$QP" ]; then
  while kill -0 "$QP" 2>/dev/null; do sleep 20; done
fi
echo "$(date) q1 finished — starting queue4" >> /tmp/tpuq_status.log

echo "$(date) leg: bench.py" >> /tmp/tpuq_status.log
timeout 2400 python -u bench.py > /tmp/q_bench.log 2>&1
echo "$(date) bench rc=$?" >> /tmp/tpuq_status.log

echo "$(date) leg: geof A/B 2e6" >> /tmp/tpuq_status.log
timeout 1800 python -u tools/geof_ab.py --n 2000000 > /tmp/q_geofab.log 2>&1
echo "$(date) geof-ab rc=$?" >> /tmp/tpuq_status.log
echo "$(date) queue4 done" >> /tmp/tpuq_status.log
