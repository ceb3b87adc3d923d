"""Per-component decomposition of the vocoder train step (VERDICT r3 #5).

The MR-STFT vocoder step measured 37.7 ms at 9.6% MFU (bench config 8,
results_r3_vocoder.json) and round 3 waved it off without arithmetic.
This probe times every component of the flagship-shaped generator
(B=16 x 32 mel frames, 128 mels, up 8x8, initial channel 512, n_fft 16)
separately — forward AND fwd+bwd — with pre-staged distinct device
inputs and a per-iter forced host fetch (the round-3 measurement rules:
benchmarks/README.md "Per-contributor backward table"), plus the
iSTFT + 3-resolution MR-STFT loss tail. Per-component TF/s against the
conv FLOPs says which (if any) layer is an outlier vs the others rather
than the whole model just being small-conv bound.

Usage: python benchmarks/probe_vocoder.py [--iters 12]
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


def conv_flops(b, t, cin, cout, k):
    return 2.0 * b * t * cin * cout * k


def _time_fn(fn, inputs, iters):
    import jax.numpy as jnp

    outs = [fn(x) for x in inputs[:2]]  # compile + warm
    for o in outs:
        float(jnp.sum(o[0]) if isinstance(o, tuple) else jnp.sum(o))
    t0 = time.perf_counter()
    outs = [fn(inputs[i % len(inputs)]) for i in range(iters)]
    for o in outs:
        float(jnp.sum(o[0]) if isinstance(o, tuple) else jnp.sum(o))
    return (time.perf_counter() - t0) / iters


def probe(iters):
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.models.istft_vocoder import ISTFTNetGenerator, MRFBlock
    from mqgan_tpu.nn.conv import WNConv

    rng = np.random.default_rng(0)

    def staged(shape, n=4):
        return [jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                for _ in range(n)]

    rows = []

    def leg(name, module, in_shape, flops, pre=None):
        x0 = staged(in_shape)
        params = jax.jit(module.init)(jax.random.key(0), x0[0])

        def fwd(x):
            h = pre(x) if pre is not None else x
            return module.apply(params, h)

        def fwdbwd(x):
            def loss(p):
                h = pre(x) if pre is not None else x
                return jnp.sum(jnp.square(module.apply(p, h)))

            l, g = jax.value_and_grad(loss)(params)
            return l[None] if l.ndim == 0 else l

        f = _time_fn(jax.jit(fwd), x0, iters)
        fb = _time_fn(jax.jit(fwdbwd), x0, iters)
        rows.append({
            "component": name, "in_shape": list(in_shape),
            "fwd_ms": round(f * 1e3, 2), "fwdbwd_ms": round(fb * 1e3, 2),
            "bwd_over_fwd": round((fb - f) / f, 2),
            "gflop_fwd": round(flops / 1e9, 1),
            "tflops_fwd": round(flops / f / 1e12, 1),
            "tflops_fwdbwd": round(3 * flops / fb / 1e12, 1),
        })
        print(rows[-1], flush=True)

    t1 = T_MEL * UP[0]          # 256
    t2 = t1 * UP[1]             # 2048

    def mrf_flops(b, t, c):
        # per kernel k: 3 dilation stages x 2 convs of kernel k
        return sum(conv_flops(b, t, c, c, k) * 6 for k in (3, 7, 11))

    leg("conv_pre k7 128->512", WNConv(CH0, (7,), use_weight_norm=True),
        (B, T_MEL, MELS), conv_flops(B, T_MEL, MELS, CH0, 7))
    leg("up_0 repeat8+k17 512->256", WNConv(256, (17,), use_weight_norm=True),
        (B, T_MEL, CH0), conv_flops(B, t1, CH0, 256, 17),
        pre=lambda x: jnp.repeat(x, UP[0], axis=1))
    leg("mrf_0 C=256 T=256", MRFBlock(256), (B, t1, 256),
        mrf_flops(B, t1, 256))
    leg("up_1 repeat8+k17 256->128", WNConv(128, (17,), use_weight_norm=True),
        (B, t1, 256), conv_flops(B, t2, 256, 128, 17),
        pre=lambda x: jnp.repeat(x, UP[1], axis=1))
    leg("mrf_1 C=128 T=2048", MRFBlock(128), (B, t2, 128),
        mrf_flops(B, t2, 128))
    leg("conv_post k7 128->18", WNConv(2 * (N_FFT // 2 + 1), (7,),
                                       use_weight_norm=True),
        (B, t2, 128), conv_flops(B, t2, 128, 18, 7))

    # ---- the loss tail: iSTFT head + MR-STFT on (B, 16384) samples -----
    from mqgan_tpu.losses.stft_loss import multi_resolution_stft_loss
    from mqgan_tpu.signal.stft import istft

    spec_in = staged((B, N_FFT // 2 + 1, t2))
    n_samples = N_FFT + ISTFT_HOP * (t2 - 1)
    wav_ref = staged((B, n_samples), n=1)

    def tail(args_i):
        spec = jnp.exp(jnp.clip(args_i, -11.0, 6.0))
        wav = istft(spec, jnp.zeros_like(spec), n_fft=N_FFT,
                    hop_length=ISTFT_HOP, win_length=N_FFT)[:, 0]
        loss = multi_resolution_stft_loss(wav, wav_ref[0])
        return loss[None] if np.ndim(loss) == 0 else jnp.asarray(loss)[None]

    def tail_bwd(x):
        l, g = jax.value_and_grad(
            lambda s: jnp.sum(jnp.asarray(tail(s))))(x)
        return l[None]

    f = _time_fn(jax.jit(tail), spec_in, iters)
    fb = _time_fn(jax.jit(tail_bwd), spec_in, iters)
    rows.append({"component": "istft+mrstft_loss",
                 "fwd_ms": round(f * 1e3, 2),
                 "fwdbwd_ms": round(fb * 1e3, 2)})
    print(rows[-1], flush=True)

    # ---- whole fwd for cross-check against the component sum -----------
    gen = ISTFTNetGenerator(n_mels=MELS, upsample_rates=UP,
                            upsample_initial_channel=CH0, istft_n_fft=N_FFT)
    mel_in = staged((B, MELS, T_MEL))
    gp = jax.jit(gen.init)(jax.random.key(0), mel_in[0])
    f_full = _time_fn(jax.jit(lambda m: gen.apply(gp, m)[0]), mel_in, iters)

    def full_bwd(m):
        def loss(p):
            s, ph = gen.apply(p, m)
            return jnp.sum(jnp.square(s)) + jnp.sum(jnp.square(ph))

        l, g = jax.value_and_grad(loss)(gp)
        return l[None]

    fb_full = _time_fn(jax.jit(full_bwd), mel_in, iters)
    rows.append({"component": "FULL generator",
                 "fwd_ms": round(f_full * 1e3, 2),
                 "fwdbwd_ms": round(fb_full * 1e3, 2)})
    print(rows[-1], flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_vocoder.json"))
    args = p.parse_args(argv)
    rows = probe(args.iters)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
