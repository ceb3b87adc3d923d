"""Per-component decomposition of the vocoder train step (VERDICT r3 #5).

The MR-STFT vocoder step measured 37.7 ms at 9.6% MFU (bench config 8,
results_r3_vocoder.json) and round 3 waved it off without arithmetic.
This probe times every component of the flagship-shaped generator
(B=16 x 32 mel frames, 128 mels, up 8x8, initial channel 512, n_fft 16)
with the round-3 chain methodology (probe_backward.py: N_CHAIN calls as a
lax.scan inside ONE jitted executable, distinct pre-staged inputs, the
carry threading a 1e-32 scalar so XLA cannot cache iterations, one
host fetch per measurement; N=64 keeps the tunnel-dispatch bias <0.5 ms/iter for these sub-ms components) —
in the trainer's shipped fp32 AND in bf16, because the vocoder trainer
had no precision knob and fp32 halves (or worse) the v5e MXU rate.

XLA cost-analysis FLOPs from the same executables give honest TF/s per
component; the verdict (ship a win / publish the floor) lands in
benchmarks/README.md.

Usage: python benchmarks/probe_vocoder.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T_MEL, MELS = 16, 32, 128
UP = (8, 8)
CH0 = 512
N_FFT = 16
ISTFT_HOP = 8  # total samples/frame = 8*8*8 = 512 = flagship hop
N_CHAIN = 64  # sub-ms components: amortize the ~30 ms tunnel dispatch to <0.5 ms/iter


def _chain_time(compiled, *args) -> float:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(*args)
        _ = float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def probe_component(name, apply_fn, params, xs, extra=None):
    """Chained fwd + fwd/grad timings with XLA cost-analysis TF/s."""
    import jax
    import jax.numpy as jnp

    def fwd_chain(params, xs):
        def body(c, x):
            y = apply_fn(params, x + c.astype(x.dtype) * 1e-32)
            return jnp.sum(y.astype(jnp.float32)) * 1e-32, None

        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    def loss(params, x):
        return jnp.sum(apply_fn(params, x).astype(jnp.float32))

    def grad_chain(params, xs):
        def body(c, x):
            l, g = jax.value_and_grad(loss)(
                params, x + c.astype(x.dtype) * 1e-32)
            gs = sum(jnp.sum(leaf).astype(jnp.float32)
                     for leaf in jax.tree.leaves(g))
            return (l + gs) * 1e-32, None

        c, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return c

    out = {"probe": name, "n_chain": N_CHAIN}
    if extra:
        out.update(extra)
    for tag, fn in (("fwd", fwd_chain), ("fwdgrad", grad_chain)):
        compiled = jax.jit(fn).lower(params, xs).compile()
        try:
            flops = (compiled.cost_analysis() or {}).get("flops", 0.0)
        except Exception:  # noqa: BLE001
            flops = 0.0
        per = _chain_time(compiled, params, xs) / N_CHAIN
        per_flops = flops / N_CHAIN
        out[f"{tag}_ms"] = round(per * 1e3, 2)
        out[f"{tag}_tf_per_s"] = round(per_flops / per / 1e12, 1)
    out["grad_over_fwd"] = round(
        (out["fwdgrad_ms"] - out["fwd_ms"]) / max(out["fwd_ms"], 1e-9), 2)
    print(json.dumps(out), flush=True)
    return out


def probe(dtype_tag):
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.istft_vocoder import ISTFTNetGenerator, MRFBlock
    from mqgan_tpu.nn.conv import WNConv

    dtype = jnp.bfloat16 if dtype_tag == "bf16" else None
    rng = np.random.default_rng(0)

    def staged(shape):
        return jnp.asarray(
            rng.standard_normal((N_CHAIN,) + shape).astype(np.float32))

    t1 = T_MEL * UP[0]          # 256
    t2 = t1 * UP[1]             # 2048
    rows = []

    def leg(name, module, in_shape, pre=None):
        xs = staged(in_shape)
        params = jax.jit(module.init)(jax.random.key(0), xs[0])

        def apply_fn(p, x):
            h = pre(x) if pre is not None else x
            return module.apply(p, h)

        rows.append(probe_component(
            f"{name}[{dtype_tag}]", apply_fn, params, xs,
            extra={"in_shape": list(in_shape)}))

    leg("conv_pre k7 128->512",
        WNConv(CH0, (7,), use_weight_norm=True, dtype=dtype),
        (B, T_MEL, MELS))
    leg("up_0 repeat8+k17 512->256",
        WNConv(256, (17,), use_weight_norm=True, dtype=dtype),
        (B, T_MEL, CH0), pre=lambda x: jnp.repeat(x, UP[0], axis=1))
    leg("mrf_0 C=256 T=256", MRFBlock(256, dtype=dtype), (B, t1, 256))
    leg("up_1 repeat8+k17 256->128",
        WNConv(128, (17,), use_weight_norm=True, dtype=dtype),
        (B, t1, 256), pre=lambda x: jnp.repeat(x, UP[1], axis=1))
    leg("mrf_1 C=128 T=2048", MRFBlock(128, dtype=dtype), (B, t2, 128))
    leg("conv_post k7 128->18",
        WNConv(2 * (N_FFT // 2 + 1), (7,), use_weight_norm=True,
               dtype=dtype),
        (B, t2, 128))

    # whole generator, same chain method — the cross-check that the
    # component sum accounts for the step
    gen = ISTFTNetGenerator(n_mels=MELS, upsample_rates=UP,
                            upsample_initial_channel=CH0,
                            istft_n_fft=N_FFT, dtype=dtype)
    xs = staged((B, MELS, T_MEL))
    gp = jax.jit(gen.init)(jax.random.key(0), xs[0])

    def gen_apply(p, m):
        s, ph = gen.apply(p, m)
        return s + ph

    rows.append(probe_component(f"FULL generator[{dtype_tag}]", gen_apply,
                                gp, xs))
    return rows


def probe_loss_tail():
    """iSTFT + 3-resolution MR-STFT loss on (B, ~16K) samples, fp32
    (the loss stays fp32 under any generator precision)."""
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.losses.stft_loss import multi_resolution_stft_loss
    from mqgan_tpu.signal.stft import istft

    t2 = T_MEL * UP[0] * UP[1]
    n_samples = N_FFT + ISTFT_HOP * (t2 - 1)
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal(
        (N_CHAIN, B, N_FFT // 2 + 1, t2)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal(
        (B, n_samples)).astype(np.float32))

    def apply_fn(ref, x):
        spec = jnp.exp(jnp.clip(x, -11.0, 6.0))
        wav = istft(spec, jnp.zeros_like(spec), n_fft=N_FFT,
                    hop_length=ISTFT_HOP, win_length=N_FFT)[:, 0]
        n = min(wav.shape[1], ref.shape[1])  # trainer loss_fn contract
        return multi_resolution_stft_loss(wav[:, :n], ref[:, :n])[None]

    return probe_component("istft+mrstft_loss[fp32]", apply_fn, ref, xs)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_vocoder.json"))
    args = p.parse_args(argv)
    rows = []
    for tag in ("fp32", "bf16"):
        rows.extend(probe(tag))
    rows.append(probe_loss_tail())
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
