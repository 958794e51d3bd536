#!/bin/bash
# Probe tunnel health; if a healthy window (<1.2 ms trivial chain) is
# found, run the 65k mf factor (the <100 ms target needs one).  One
# probe + optional run per invocation — call between other stages.
set -u
cd /root/repo
H=$(PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python - <<'EOF' 2>/dev/null | tail -1
import jax, jax.numpy as jnp
from sprs_tpu.utils.profile import chain_time_best
f = jax.jit(lambda v: v * 1.01 + 1)
h = chain_time_best(f, jnp.ones((1 << 20,), jnp.float32), iters=20, rounds=2)
print(f"{h*1e3:.3f}")
EOF
)
echo "health_ms=$H"
ok=$(python3 -c "print(1 if float('$H' or 99) < 1.2 else 0)")
if [ "$ok" = "1" ]; then
  echo "HEALTHY WINDOW — running 65k mf"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python benches/ldl_big.py \
    --grid 256 --fill nd --kind mf --no-flat --iters 4 \
    --json benches/results_r5/ldl256_mf_healthy.json --host-check off
else
  echo "degraded — skip"
fi
