#!/bin/bash
# Round-5 TPU measurement queue. Waits for the tunnel, then runs every
# queued measurement; each writes its own results file and is independent
# (a failure moves on to the next).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

echo "waiting for tunnel..."
for i in $(seq 1 240); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; float(jnp.sum(jnp.ones((8,8))))" 2>/dev/null; then
    echo "tunnel alive after $i probes"; break
  fi
  sleep 30
done

set -x
timeout 1800 python -u /tmp/bench_split_probe.py 2>&1 | grep -v WARNING | tail -8
timeout 900 python -u bench.py 2>&1 | tail -2
timeout 1800 python -u benchmarks/probe_vocoder_adv.py 2>&1 | tail -4
timeout 1800 python -u benchmarks/bench_kv_decode.py 2>&1 | tail -5
timeout 600 python -u benchmarks/probe_eval_fetch.py 2>&1 | tail -3
timeout 3600 python -u benchmarks/bench_flash_sweep.py 2>&1 | tail -20
echo R5_QUEUE_DONE
