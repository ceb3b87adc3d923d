#!/bin/bash
# Round-3 TPU experiment queue: waits for the axon tunnel to come back,
# then runs the pending measurements sequentially. Safe to re-run; each
# step writes its own artifact under benchmarks/.
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

run python benchmarks/ablate_step.py \
    --variants full nodrop drop_no_mixers drop_mixers_only \
    --out benchmarks/ablate_r3.json
run python benchmarks/bench_all.py --configs 5 5p \
    --out benchmarks/results_r3_poly.json
run python benchmarks/bench_all.py --configs 3bf \
    --out benchmarks/results_r3_fastdrop.json
run python benchmarks/bench_all.py --configs 3bc \
    --out benchmarks/results_r3_chunk.json
run python benchmarks/bench_streaming.py \
    --out benchmarks/results_r3_streaming.json
run python bench.py
echo "[queue] done"
