#!/bin/bash
# Round-3 (continuation) TPU queue: waits for the axon tunnel, then runs
# the pending measurements. Safe to re-run; each step writes its own
# artifact under benchmarks/.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {
  timeout 180 python -c "import jax; assert jax.devices()" >/dev/null 2>&1
}

echo "[queue] waiting for TPU tunnel..."
for i in $(seq 1 90); do
  if probe; then echo "[queue] tunnel up (probe $i)"; break; fi
  if [ "$i" = 90 ]; then echo "[queue] gave up waiting"; exit 1; fi
  sleep 240
done

run() {
  echo "[queue] === $* ($(date +%H:%M:%S))"
  timeout 3500 "$@"
  echo "[queue] exit=$? ($(date +%H:%M:%S))"
}

# token-LM autoregressive generation throughput (net-new serving surface)
run python benchmarks/bench_all.py --configs 7 \
    --out benchmarks/results_r3_lm_gen.json
run python benchmarks/bench_all.py --configs 7b \
    --out benchmarks/results_r3_lm_gen_b1.json
# headline sanity for the driver's end-of-round run
run python bench.py
echo "[queue] done"
