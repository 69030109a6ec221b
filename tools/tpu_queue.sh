#!/bin/bash
# Fires the round-3 TPU measurement queue once the axon tunnel answers.
# Each leg logs to /tmp/tpuq_<leg>.log and writes its usual results json.
set -u
cd /root/repo

probe() {
  timeout 120 python -u -c "
import jax
print(jax.devices(), flush=True)
import jax.numpy as jnp
x = jnp.ones((256,256)); print(float(jnp.sum(x@x)), flush=True)
" >/dev/null 2>&1
}

echo "$(date) waiting for TPU" > /tmp/tpuq_status.log
for i in $(seq 1 300); do
  if probe; then
    echo "$(date) TPU up — starting queue" >> /tmp/tpuq_status.log
    break
  fi
  sleep 120
done
probe || { echo "$(date) gave up" >> /tmp/tpuq_status.log; exit 1; }

echo "$(date) leg1: bigcloud_partition 2e6 (cold/warm receipts)" >> /tmp/tpuq_status.log
timeout 5400 python -u tools/bigcloud_partition.py --sizes 2000000 10000000 \
  > /tmp/tpuq_bigcloud.log 2>&1
echo "$(date) leg1 rc=$?" >> /tmp/tpuq_status.log

echo "$(date) leg2: semantic3d headline 1e8" >> /tmp/tpuq_status.log
timeout 7200 python -u tools/semantic3d_headline.py --raw_points 100000000 \
  > /tmp/tpuq_headline1e8.log 2>&1
echo "$(date) leg2 rc=$?" >> /tmp/tpuq_status.log
echo "$(date) queue done" >> /tmp/tpuq_status.log
