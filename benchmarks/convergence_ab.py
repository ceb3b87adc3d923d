"""Convergence A/B harness: train the SAME synthetic task under variant
generator settings and compare recon-loss trajectories.

Round-1 established the baseline ("recon MSE 27 -> 0.76 over 300 steps,
medium model, synthetic gaussian-track mels" — CLAUDE.md); this script
makes that smoke reproducible and runs it per variant so behavioral flags
(--fast_dropout's Gaussian mixer noise, rng_impl, remat chunking) carry
measured convergence evidence, not just step-time wins.

Variants share the data stream, init seed, and schedule; only the flag
under test differs. Writes one JSON with per-variant trajectories.

Usage (TPU or CPU):
  python benchmarks/convergence_ab.py --steps 300 --variants exact fast
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_gaussian_tracks(rng, b, t, mel):
    """Log-mel-like synthetic batch: a few wandering gaussian ridges per
    clip over a noise floor (enough structure to make recon a real task)."""
    out = np.full((b, t, mel), -9.0, np.float32)
    bins = np.arange(mel, dtype=np.float32)
    for i in range(b):
        for _ in range(rng.integers(2, 5)):
            c0 = rng.uniform(0.15 * mel, 0.85 * mel)
            drift = rng.uniform(-0.02, 0.02) * mel
            width = rng.uniform(1.5, 4.0)
            amp = rng.uniform(4.0, 8.0)
            centers = c0 + drift * np.arange(t) + \
                np.cumsum(rng.normal(0, 0.3, t))
            ridge = amp * np.exp(
                -0.5 * ((bins[None, :] - centers[:, None]) / width) ** 2)
            out[i] += ridge.astype(np.float32)
    out += rng.normal(0, 0.3, out.shape).astype(np.float32)
    return np.clip(out, -11.5, 3.0)


def medium_cfg(variant, lr=None, warmup=None, scale="medium"):
    from mqgan_tpu.core.config import TrainConfig

    train_d = {}
    if lr is not None:
        train_d["lr"] = lr
    if warmup is not None:
        train_d["warmup_steps"] = warmup
    if scale == "flagship":
        # the full hifispeech generator (config defaults mirror the
        # reference model_config_hifispeech.yaml) with --remat, i.e. the
        # exact model the headline train bench runs — the scale at which
        # a default-on decision for fast_dropout must hold
        model_d = {"mel_channels": 128, "generator": {"remat": True}}
    else:
        model_d = {
            "mel_channels": 64,
            "generator": {
                "channels": [128, 128, 192],
                "kernel_sizes": [3, 3, 5],
                "fsq_levels": [8, 5, 5],
                "refiner_base_channels": 32,
                "refiner_depth": 2,
            },
        }
    cfg = TrainConfig.from_dict({
        "model": model_d,
        "training": train_d,
    })
    # composable: "+"-joined parts, e.g. "fast+fsqnoise5" checks the
    # default-on fast-dropout against the codebook-health knob together
    over = {}
    for part in variant.split("+"):
        if part == "fast":
            over["fast_dropout"] = True
        elif part in ("exact", "accum"):
            # "accum": identical config; the step runs as 2 scanned
            # microbatches (grad_accum=2, see run_variant) — the
            # convergence check for the effective-batch knob (dropout
            # draws differ from "exact" by construction)
            pass
        elif part.startswith("fsqnoise"):
            # codebook-health experiment (round-1 observation: usage
            # collapse to <5/1000 codes on synthetic data): A/B the
            # reference's mitigation knob, FSQ noise dropout
            # (quantizer.py:142-156; reference default 0.0 — "fsqnoise0"
            # IS the baseline; the NSQ paper it cites,
            # arXiv:2411.19842 §3.2, uses 0.5)
            over["fsq_noise_dropout"] = float(part[len("fsqnoise"):]) / 10.0
        else:
            raise SystemExit(f"unknown variant part {part!r}")
    if over:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, generator=dataclasses.replace(
                cfg.model.generator, **over)))
    return cfg


def run_variant(variant, steps, b, t, log_every, lr=None, warmup=None,
                scale="medium"):
    import jax
    import jax.numpy as jnp

    from mqgan_tpu.train.state import create_train_state
    from mqgan_tpu.train.step import build_models, make_train_step

    cfg = medium_cfg(variant, lr=lr, warmup=warmup, scale=scale)
    mel_ch = cfg.model.mel_channels
    gen, patch, mb = build_models(cfg, jnp.bfloat16)
    data_rng = np.random.default_rng(0)  # SHARED stream across variants

    k = jax.random.key(0, impl=cfg.training.rng_impl)
    init_mel = jnp.zeros((b, t, mel_ch), jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)
    state, _, _ = create_train_state(
        gen_variables=jax.jit(gen.init)(k, init_mel, lens),
        patch_variables=jax.jit(patch.init)(k, init_mel, lens),
        multibin_variables=jax.jit(mb.init)(k, init_mel, lens),
        training_cfg=cfg.training, rng=k,
    )
    step = make_train_step(cfg, train_d=False, dtype=jnp.bfloat16,
                           grad_accum=2 if "accum" in variant.split("+") else 1)
    compiled = step.lower(state, init_mel, lens).compile()

    traj = []
    t0 = time.perf_counter()
    for i in range(steps):
        mel = jnp.asarray(synth_gaussian_tracks(data_rng, b, t, mel_ch))
        state, m = compiled(state, mel, lens)
        if (i + 1) % log_every == 0 or i == 0:
            traj.append({"step": i + 1,
                         "recon_pre": round(float(m["loss_recon_pre"]), 4),
                         "recon_post": round(float(m["loss_recon_post"]), 4),
                         "codebook_usage": round(
                             float(m["codebook_usage"]), 3),
                         "codebook_perplexity": round(
                             float(m["codebook_perplexity"]), 1)})
            print(f"[{variant}] {traj[-1]}", flush=True)
    wall = time.perf_counter() - t0
    return {"variant": variant, "scale": scale, "steps": steps,
            "batch": b, "frames": t,
            "wall_s": round(wall, 1), "trajectory": traj,
            "final_recon_pre": traj[-1]["recon_pre"],
            "final_codebook_usage": traj[-1]["codebook_usage"],
            "final_codebook_perplexity": traj[-1]["codebook_perplexity"]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="+", default=["exact", "fast"])
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--log_every", type=int, default=25)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--scale", choices=("medium", "flagship"),
                   default="medium")
    p.add_argument("--warmup", type=int, default=None,
                   help="override warmup_steps (default 1000 is most of a "
                        "short smoke; ~steps/6 makes the loss move)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "convergence_ab.json"))
    args = p.parse_args(argv)

    results = [run_variant(v, args.steps, args.batch, args.frames,
                           args.log_every, lr=args.lr, warmup=args.warmup,
                           scale=args.scale)
               for v in args.variants]
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)
    for r in results:
        print(r["variant"], "final recon_pre:", r["final_recon_pre"],
              f"({r['wall_s']}s)")


if __name__ == "__main__":
    main()
