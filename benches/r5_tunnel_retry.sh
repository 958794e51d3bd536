#!/bin/bash
# Patient tunnel-retry loop (session-3 pattern): probe backend init
# every ~8 min; when it comes up, run the queued round-5 measurement
# stages sequentially, then exit.  Never kills a probe mid-flight
# (wedge risk) — each probe gets a generous timeout and we WAIT.
set -u
cd /root/repo
LOG=${LOG:-/tmp/r5_retry_loop.log}
echo "retry loop start $(date)" >> "$LOG"
for i in $(seq 1 40); do
  PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python - >> "$LOG" 2>&1 <<'EOF'
import jax
jax.devices()
print("BACKEND UP")
EOF
  if grep -q "BACKEND UP" "$LOG"; then
    echo "up at $(date); running stages" >> "$LOG"
    PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python benches/ldl_big.py \
      --grid 256 --fill nd --kind mf --no-flat --iters 4 --host-check off \
      --json benches/results_r5/ldl256_mf_solveb.json >> "$LOG" 2>&1
    PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 python benches/ldl_big.py \
      --grid 1024 --fill nd --kind mf --no-flat --iters 2 --host-check off \
      --json benches/results_r5/ldl1024_mf_solveb.json >> "$LOG" 2>&1
    echo "stages done $(date)" >> "$LOG"
    exit 0
  fi
  echo "probe $i down $(date)" >> "$LOG"
  sleep 420
done
echo "gave up $(date)" >> "$LOG"
