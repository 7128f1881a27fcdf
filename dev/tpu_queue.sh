#!/bin/bash
# Run all queued TPU measurements sequentially (one relay connection
# window).  Each step logs to /tmp/tpu_*.log; continues on failure.
cd /root/repo
set -x
timeout 2400 python scripts/run_tpu_goldens.py tests/data/tpu_wave_goldens.json > /tmp/tpu_goldens.log 2>&1
timeout 1800 python dev/p5_tune.py > /tmp/tpu_p5.log 2>&1
timeout 900 python - > /tmp/tpu_relayout.log 2>&1 <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import jax.numpy as jnp
from mxu_micro import relayout_cost
for rows, lanes, dt in ((512, 128, jnp.float32), (128, 128, jnp.float32),
                        (1024, 128, jnp.float32), (512, 128, jnp.bfloat16),
                        (512, 256, jnp.float32)):
    c = relayout_cost(rows=rows, lanes=lanes, dtype=dt)
    print(f"relayout ({rows}x{lanes}, {dt.__name__}): {c:.3f} us/Melem",
          flush=True)
EOF
timeout 2400 python bench.py > /tmp/tpu_bench.log 2>&1
echo ALL_DONE
