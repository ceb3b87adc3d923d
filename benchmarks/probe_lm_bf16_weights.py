"""bf16 weights for LM decode: halves per-step weight reads."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from mqgan_tpu.models.token_lm import build_token_lm
from mqgan_tpu.models.lm_sampling import (generate_tokens_served,
                                          generate_tokens_transformer_served)

V, B, L = 1003, 64, 512
mask = np.ones((V,), bool); mask[:3] = False; mask = jnp.asarray(mask)
genres = jnp.zeros((B,), jnp.int32)
prompt = jnp.zeros((B, 1), jnp.int32)
p_lens = jnp.zeros((B,), jnp.int32)

def bench(arch, wdtype, kv=None):
    args = dict(vocab_size=V, num_genres=10, emb_dim=512, pad_id=0, bos_id=1,
                arch=arch, lstm_hid=1024, lstm_layers=2, n_layers=6,
                n_heads=8, mlp_ratio=4)
    model = build_token_lm(args, dropout=0.0, for_inference=True)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 8), jnp.int32),
                                 jnp.zeros((1,), jnp.int32), None)["params"]
    if wdtype is not None:
        model = model.clone(dtype=wdtype)
        params = jax.tree.map(
            lambda x: x.astype(wdtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    sampler = (generate_tokens_transformer_served if arch == "transformer"
               else generate_tokens_served)
    kw = {"kv_dtype": kv} if kv is not None else {}
    fn = jax.jit(partial(sampler, model, params, max_len=L, bos_id=1, **kw))
    def gen(seed):
        seeds = jnp.asarray(seed + np.arange(B, dtype=np.int32), jnp.int32)
        return fn(genres, seeds, prompt, p_lens, jnp.float32(1.0),
                  jnp.int32(64), jnp.float32(0.0), mask)
    for s in (900, 901):
        float(jnp.sum(gen(s)))
    t0 = time.perf_counter()
    outs = [gen(100 + 1000*i) for i in range(4)]
    for o in outs: float(jnp.sum(o))
    per = (time.perf_counter() - t0) / 4
    tag = f"{arch} w={'bf16' if wdtype else 'fp32'}" + (f" kv=bf16" if kv else "")
    print(f"{tag}: {per*1e3/L:.3f} ms/token, {B*L/per:,.0f} tok/s", flush=True)

bench("lstm", None)
bench("lstm", jnp.bfloat16)
bench("transformer", jnp.bfloat16, kv=jnp.bfloat16)
