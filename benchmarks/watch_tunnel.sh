#!/bin/bash
# Probe the TPU tunnel; when it answers, run the measurement sweep + bench.
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; print(jax.devices())" >/tmp/tpu_probe.log 2>&1; then
    echo "TPU RESPONSIVE at $(date)" | tee -a /tmp/tpu_watch.log
    break
  fi
  echo "tpu down $(date)" >> /tmp/tpu_watch.log
  sleep 60
done
timeout 2400 python benchmarks/sweep.py > /tmp/tpu_sweep.log 2>&1
echo "SWEEP DONE rc=$? $(date)" | tee -a /tmp/tpu_watch.log
BENCH_BUDGET_S=900 timeout 1500 python bench.py > /tmp/tpu_bench.log 2>&1
echo "BENCH DONE rc=$? $(date)" | tee -a /tmp/tpu_watch.log
