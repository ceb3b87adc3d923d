"""Cost of the multihost eval param fetch (VERDICT r4 #8).

In a multi-process run, eval/plots are primary-only: the primary cannot
jit against the global-mesh state (other processes would never join), so
`Trainer._local_gen_params` device_gets the replicated generator params
to host and re-puts them on a local device once per eval epoch
(train/trainer.py). This probe measures that round-trip at flagship
scale on the real chip — the decision input for "fetch once per
improvement / device-side eval" vs "not worth it".

Usage: python benchmarks/probe_eval_fetch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.core.config import GeneratorConfig
    from mqgan_tpu.models.preencoder import PreEncoder

    gen = PreEncoder.from_config(128, GeneratorConfig(), dtype=None)
    mel = jnp.zeros((1, 256, 128), jnp.float32)
    lens = jnp.full((1,), 256, jnp.int32)
    params = jax.jit(gen.init)(jax.random.key(0), mel, lens)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree.leaves(params))

    # the eval fetch: device -> host -> device (what _local_gen_params
    # does per eval epoch in a multi-process run)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        host = jax.device_get(params)
        back = jax.device_put(host, jax.local_devices()[0])
        jax.block_until_ready(back)
        # force real arrival: touch one leaf scalar
        _ = float(np.asarray(jax.tree.leaves(host)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    row = {
        "config": "r5_multihost_eval_fetch",
        "gen_param_mb": round(n_bytes / 2**20, 1),
        "fetch_roundtrip_s": round(sorted(ts)[1], 2),
        "all_runs_s": [round(t, 2) for t in ts],
    }
    print(json.dumps(row))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_r5_eval_fetch.json")
    with open(out, "w") as f:
        json.dump([row], f, indent=1)
        f.write("\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
