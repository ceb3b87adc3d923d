"""Chain-measure the FULL adversarial vocoder step (VERDICT r4 #3).

Round 4 proved serial-dispatch timing of this environment's tunnel
overstates sub-50 ms steps by ~3x (the MR-STFT step's "37.7 ms" was
10.18 ms true device time, results_r4_vocoder_chain.json). The
adversarial step's quoted 193.6 ms (bf16, results_r4_vocoder.json) is a
serial figure of exactly that kind — this probe chains N REAL
adversarial steps (train/vocoder_trainer.py:make_adv_step — the exact
function the CLI jits) as a lax.scan inside ONE executable: the
(params, opt, d_params, d_opt) state threads through the carry and every
iteration consumes a distinct pre-staged (mel, wav) batch, so the tunnel
cannot cache or elide iterations; one host fetch per measurement.

Shapes match bench config 8a (results_r4_vocoder.json): B=16 x 32 mel
frames, 128 mels, up 8x8 ch0=512, n_fft 16, MPD periods [2,3,5,7,11],
MSD 3 scales — the flagship vocoder adversarial step. XLA cost-analysis
FLOPs from the same executable give the honest MFU.

Usage: python benchmarks/probe_vocoder_adv.py
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
ISTFT_HOP = 8
HOP = 512  # = prod(UP) * ISTFT_HOP, flagship mel hop
N_CHAIN = 16  # ~100ms-class step: dispatch bias < 2 ms/iter
PEAK_TF = 197.0  # v5e bf16; fp32 runs at half the MXU rate (98.5)


def measure(dtype_tag):
    import jax
    import jax.numpy as jnp
    import optax

    from mqgan_tpu.models.istft_vocoder import ISTFTNetGenerator
    from mqgan_tpu.models.wave_discriminators import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )
    from mqgan_tpu.train.vocoder_trainer import make_adv_step

    dtype = jnp.bfloat16 if dtype_tag == "bf16" else None
    target_len = T_MEL * HOP

    gen = ISTFTNetGenerator(n_mels=MELS, upsample_rates=UP,
                            upsample_kernel_sizes=tuple(2 * r + 1 for r in UP),
                            upsample_initial_channel=CH0,
                            istft_n_fft=N_FFT, dtype=dtype)
    mpd = MultiPeriodDiscriminator(periods=(2, 3, 5, 7, 11))
    msd = MultiScaleDiscriminator(n_scales=3)

    rng = np.random.default_rng(0)
    mel0 = jnp.asarray(rng.standard_normal((B, MELS, T_MEL)).astype(np.float32))
    wav_ex = jnp.zeros((B, target_len))
    params = jax.jit(gen.init)(jax.random.key(0), mel0)
    d_params = {
        "mpd": jax.jit(mpd.init)(jax.random.key(1), wav_ex)["params"],
        "msd": jax.jit(msd.init)(jax.random.key(2), wav_ex)["params"],
    }
    tx = optax.adamw(2e-4)
    d_tx = optax.adamw(2e-4)
    opt = tx.init(params)
    d_opt = d_tx.init(d_params)

    step = make_adv_step(gen, mpd, msd, tx, d_tx, n_fft=N_FFT,
                         istft_hop=ISTFT_HOP, target_len=target_len)

    mels = jnp.asarray(rng.standard_normal(
        (N_CHAIN, B, MELS, T_MEL)).astype(np.float32))
    wavs = jnp.asarray(0.1 * rng.standard_normal(
        (N_CHAIN, B, target_len)).astype(np.float32))

    def chain(params, opt, d_params, d_opt, mels, wavs):
        def body(carry, xs):
            p, o, dp, do = carry
            mel, wav = xs
            p, o, dp, do, m = step(p, o, dp, do, mel, wav)
            return (p, o, dp, do), m["g_total"]

        (_, _, _, _), totals = jax.lax.scan(
            body, (params, opt, d_params, d_opt), (mels, wavs))
        return jnp.sum(totals)

    compiled = jax.jit(chain).lower(
        params, opt, d_params, d_opt, mels, wavs).compile()
    try:
        flops = (compiled.cost_analysis() or {}).get("flops", 0.0)
    except Exception:  # noqa: BLE001
        flops = 0.0

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(params, opt, d_params, d_opt, mels, wavs)
        _ = float(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    per = sorted(ts)[1] / N_CHAIN
    peak = PEAK_TF if dtype_tag == "bf16" else PEAK_TF / 2
    tf_s = flops / N_CHAIN / per / 1e12
    row = {
        "config": f"r5_vocoder_adv_chain_{dtype_tag}",
        "batch": B, "segment_frames": T_MEL, "n_chain": N_CHAIN,
        "ms_per_step_device": round(per * 1e3, 2),
        "samples_per_sec": round(B * target_len / per, 1),
        "flops_per_step": flops / N_CHAIN,
        "tf_per_s": round(tf_s, 1),
        "mfu_pct": round(100 * tf_s / peak, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results_r5_vocoder_adv_chain.json"))
    args = p.parse_args(argv)
    rows = [measure(tag) for tag in ("fp32", "bf16")]
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
