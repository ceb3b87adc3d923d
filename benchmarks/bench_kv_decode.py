"""Transformer decode: fp32 vs bf16 KV cache (VERDICT r4 #4).

Round 4 measured the flagship transformer's exported decode at
3.08 ms/token (B=64, L=512, results_r4_lmserve.json) vs a ~1 ms-class
HBM traffic bound. The decode loop is attention-read-bound: each step
reads every layer's full (B, S, H, D) K and V. Storing them bf16 halves
those bytes while scores/softmax stay fp32 (the cache is cast up after
the read — models/token_transformer.py step_rows).

Arithmetic (flagship: 6 layers, B=64, S up to 513, 8 heads x 64 dims):
  bytes/step(fp32) = 2 * 6 * 64 * S * 512 * 4  ~= 1.61 GB at S=512
  at the v5e's ~819 GB/s HBM: ~1.97 ms/token; bf16 halves it to ~0.98.
This probe measures both caches end-to-end through the jitted served
sampler (distinct per-iter seeds + forced host fetch, tunnel rules) and
reports the implied HBM utilization against that bound.

Usage: python benchmarks/bench_kv_decode.py [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 1003
B = 64
GEN_LEN = 512
HBM_GB_S = 819.0  # v5e


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_r5_kv_decode.json"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from functools import partial

    from mqgan_tpu.models.lm_sampling import (
        generate_tokens_transformer_served)
    from mqgan_tpu.models.token_lm import build_token_lm

    margs = dict(vocab_size=VOCAB, num_genres=10, emb_dim=512, pad_id=0,
                 bos_id=1, arch="transformer", n_layers=6, n_heads=8,
                 mlp_ratio=4)
    model = build_token_lm(margs, dropout=0.0, for_inference=True)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.zeros((1,), jnp.int32), None)["params"]

    genres = jnp.zeros((B,), jnp.int32)
    prompt = jnp.zeros((B, 1), jnp.int32)
    p_lens = jnp.zeros((B,), jnp.int32)
    mask = np.ones((VOCAB,), bool)
    mask[:3] = False
    mask = jnp.asarray(mask)

    # per-step cache-read bytes at the mean sequence length (S grows
    # 1..GEN_LEN over the scan; mean = GEN_LEN/2 + 1)
    n_layers, emb = margs["n_layers"], margs["emb_dim"]
    mean_s = 1 + GEN_LEN / 2

    rows = []
    for tag, kv in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        fn = jax.jit(partial(generate_tokens_transformer_served,
                             model, params, max_len=GEN_LEN, bos_id=1,
                             kv_dtype=kv))

        def gen(seed):
            seeds = jnp.asarray(
                seed + np.arange(B, dtype=np.int32), jnp.int32)
            return fn(genres, seeds, prompt, p_lens, jnp.float32(1.0),
                      jnp.int32(64), jnp.float32(0.0), mask)

        for s in (900, 901):
            float(jnp.sum(gen(s)))
        t0 = time.perf_counter()
        outs = [gen(100 + 1000 * i) for i in range(args.iters)]
        for o in outs:
            float(jnp.sum(o))
        per = (time.perf_counter() - t0) / args.iters
        ms_tok = per * 1e3 / GEN_LEN
        kvb = jnp.dtype(kv).itemsize
        bytes_step = 2 * n_layers * B * mean_s * emb * kvb
        bound_ms = bytes_step / (HBM_GB_S * 1e9) * 1e3
        rows.append({
            "config": f"r5_kv_decode_{tag}",
            "batch": B, "gen_len": GEN_LEN, "top_k": 64,
            "ms_per_token": round(ms_tok, 3),
            "tokens_per_sec": round(B * GEN_LEN / per, 1),
            "kv_read_gb_per_step": round(bytes_step / 1e9, 3),
            "traffic_bound_ms_per_token": round(bound_ms, 3),
            "pct_of_traffic_bound": round(100 * bound_ms / ms_tok, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    rows.append({"config": "r5_kv_decode_speedup",
                 "bf16_over_fp32": round(rows[0]["ms_per_token"]
                                         / rows[1]["ms_per_token"], 2)})
    print(json.dumps(rows[-1]), flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
