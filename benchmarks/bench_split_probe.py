"""Headline-methodology probe: exact fused vs exact split vs poly split
(one encode+decode program vs two dispatches with device-resident
tokens). Round-5 measured: fused/split timing-neutral on the exact path
(142.2 vs 142.5 Kframes/s), poly split 156.1K = 1.10x — the numbers
behind the bench.py two-dispatch default (results_r5_split_probe.json)."""
import time, numpy as np
import jax, jax.numpy as jnp
from mqgan_tpu.core.config import GeneratorConfig
from mqgan_tpu.core.masking import sequence_mask
from mqgan_tpu.models.preencoder import PreEncoder
B,T,ITERS=64,512,8
rng = np.random.default_rng(0)
mels=[jnp.asarray(rng.standard_normal((B,T,128)).astype(np.float32)) for _ in range(ITERS+2)]
lens=jnp.full((B,),T,jnp.int32)

def run(tag, poly, split):
    t_setup = time.perf_counter()
    gen = PreEncoder.from_config(128, GeneratorConfig(), dtype=jnp.bfloat16).clone(poly_mixers=poly)
    params = jax.jit(gen.init)(jax.random.key(0), mels[0], lens)
    if split:
        @jax.jit
        def enc(params, mel, lengths):
            pad = sequence_mask(mel.shape[1], lengths)
            return gen.apply(params, mel, pad, method=PreEncoder.encode), pad
        @jax.jit
        def dec(params, idx, pad):
            out = gen.apply(params, idx, pad, method=PreEncoder.decode)
            return out, jnp.sum(out)
        def roundtrip(mel):
            idx, pad = enc(params, mel, lens)
            return dec(params, idx, pad)[1]
    else:
        @jax.jit
        def re(params, mel, lengths):
            pad = sequence_mask(mel.shape[1], lengths)
            idx = gen.apply(params, mel, pad, method=PreEncoder.encode)
            out = gen.apply(params, idx, pad, method=PreEncoder.decode)
            return jnp.sum(out)
        def roundtrip(mel):
            return re(params, mel, lens)
    for i in (ITERS, ITERS+1):
        float(roundtrip(mels[i]))
    print(tag, "setup+compile", round(time.perf_counter()-t_setup,1), "s", flush=True)
    t0=time.perf_counter()
    outs=[roundtrip(mels[i]) for i in range(ITERS)]
    for o in outs: float(o)
    per=(time.perf_counter()-t0)/ITERS
    print(tag, round(per*1e3,1), "ms", round(B*T/per/1e3,1), "Kframes/s", flush=True)

run("exact_fused", False, False)
run("exact_split", False, True)
run("poly_split", "decode", True)
