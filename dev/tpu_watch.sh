#!/bin/bash
# Probe the TPU relay every 3 min; when it answers, run the queued
# measurements (dev/tpu_queue.sh) and exit.
cd /root/repo
for i in $(seq 1 120); do
  if timeout 150 python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "relay up after $i probes $(date)"
    bash dev/tpu_queue.sh
    exit 0
  fi
  echo "probe $i failed $(date)"
  sleep 170
done
echo "relay never came back"
exit 1
