"""Ablation decomposition of the WARMUP (G-only) train step (round 3).

Why: the per-module probes (probe_backward.py, all run with dropout OFF)
account for only ~400 ms of the measured 936 ms warmup step at flagship
B=64 T=256 --remat. This script measures the *actual* step function with
one component knocked out at a time, so the deltas attribute the in-context
cost (residual traffic, dropout RNG + masking, optimizer, refiner
backward) that the isolated probes cannot see.

Variants (all flagship hifispeech, B=64 T=256, bf16, remat, warmup phase —
the generator half; the GAN phase adds the already-probed D-side on top):
  full        the real step: fwd (dropout ON) + vjp backward + clip + adamw
  nodrop      same but deterministic forward (no dropout draw/select)
  nodrop_opt  deterministic + no optimizer (grads summed to a scalar)
  pre_only    loss on recon_pre only -> refiner fwd+bwd DCE'd out
  fwd_loss    forward + loss value only, dropout ON (no backward, no opt)
  fwd_det     forward + loss value only, deterministic
  drop_mixers_only  full step, dropout active ONLY in the two mel-mixers
                    (trunk blocks + refiner forced deterministic)
  drop_no_mixers    full step, dropout everywhere EXCEPT the mel-mixers
  (the last two localize the remaining in-context dropout cost: mixer
  hiddens are 4.3G elements each and recompute in the checkpointed
  backward, everything else is ~100x smaller feature maps)

Methodology: same as bench_all._bench_train — AOT compile, chain the
donated state through ITERS pre-staged distinct inputs, force every
step's scalar to host at the end (the axon tunnel executes lazily).

Writes benchmarks/ablate_step.json; one JSON line per variant.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
from contextlib import contextmanager

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 6
PRACTICAL_PEAK = 216e12
B, T = 64, 256


@contextmanager
def variant_patch(variant):
    """Swap deterministic mixer/refiner subclasses into preencoder's globals.

    PreEncoder.setup() resolves MelMixer2D / UNetRefiner from the
    preencoder module namespace LAZILY, at trace time — so the patch must
    stay active through jit.lower().compile(), not just through module
    construction.  (A finally-right-after-build restore silently measures
    the unpatched model: drop_no_mixers came out bit-equal to full.)
    """
    import mqgan_tpu.models.preencoder as pe_mod
    from mqgan_tpu.nn.mixer2d import MelMixer2D
    from mqgan_tpu.nn.unet import UNetRefiner

    class _DetMixer(MelMixer2D):
        """Mixer with dropout forced off (deterministic), same param tree."""

        def __call__(self, x, pad_mask=None, deterministic=True,
                     return_hidden=False):
            return super().__call__(x, pad_mask, True, return_hidden)

    class _DetRefiner(UNetRefiner):
        def __call__(self, x, pad_mask=None, deterministic=True):
            return super().__call__(x, pad_mask, True)

    saved = (pe_mod.MelMixer2D, pe_mod.UNetRefiner)
    try:
        if variant == "drop_no_mixers":
            pe_mod.MelMixer2D = _DetMixer
        elif variant == "drop_mixers_only":
            pe_mod.UNetRefiner = _DetRefiner
        yield
    finally:
        pe_mod.MelMixer2D, pe_mod.UNetRefiner = saved


def build(cfg, variant, dtype):
    """Return a jittable fn(state, mel, lengths) -> (state, scalar).

    Must be traced/compiled inside ``variant_patch(variant)``.
    """
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from mqgan_tpu.losses.recon import masked_mel_loss
    from mqgan_tpu.train.state import make_optimizers
    from mqgan_tpu.train.step import build_models

    if variant == "drop_mixers_only":
        # Trunk-block dropout comes from cfg; the mixers hardcode 0.1
        # (reference quirk), so zeroing cfg.dropout leaves mixers active.
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, generator=dataclasses.replace(
                cfg.model.generator, dropout=0.0)))
    gen, _, _ = build_models(cfg, dtype)
    gen_tx, _ = make_optimizers(cfg.training)
    recon_all = partial(masked_mel_loss, loss_type="mse", group_size=1)
    recon_group = partial(masked_mel_loss, loss_type="mse", group_size=16)

    deterministic = variant in ("nodrop", "nodrop_opt", "fwd_det")
    want_post = variant != "pre_only"
    want_bwd = variant not in ("fwd_loss", "fwd_det")
    want_opt = variant in ("full", "nodrop", "pre_only",
                           "drop_mixers_only", "drop_no_mixers")

    def step(state, mel, lengths):
        rng, r_drop, r_fsq = jax.random.split(state.rng, 3)
        rngs = {"dropout": r_drop, "fsq_noise": r_fsq}
        mel_c = mel.astype(dtype)

        def gen_fwd(gp):
            pre, post, idx = gen.apply(
                {"params": gp}, mel_c, lengths,
                deterministic=deterministic, rngs=rngs)
            return (pre, post), idx

        def loss_of(outs):
            pre, post = outs
            l = recon_all(pre, mel, lengths) + 0.25 * recon_group(
                pre, mel, lengths)
            if want_post:
                l = l + 2.0 * (recon_all(post, mel, lengths)
                               + 0.25 * recon_group(post, mel, lengths))
            return l

        if not want_bwd:
            outs, _ = gen_fwd(state.gen_params)
            return state.replace(rng=rng), loss_of(outs).astype(jnp.float32)

        (outs, gen_vjp, _) = jax.vjp(gen_fwd, state.gen_params, has_aux=True)
        loss, out_grads = jax.value_and_grad(loss_of)(outs)
        (gen_grads,) = gen_vjp(out_grads)

        if not want_opt:
            gsum = sum(jnp.sum(g).astype(jnp.float32)
                       for g in jax.tree.leaves(gen_grads))
            return state.replace(rng=rng), loss.astype(jnp.float32) + gsum * 1e-32

        g_updates, new_opt = gen_tx.update(
            gen_grads, state.gen_opt, state.gen_params)
        new_params = optax.apply_updates(state.gen_params, g_updates)
        new_state = state.replace(
            step=state.step + 1, gen_params=new_params, gen_opt=new_opt,
            rng=rng)
        return new_state, loss.astype(jnp.float32)

    return step


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="*", default=None)
    p.add_argument("--rng_impl", default=None,
                   help="override cfg.training.rng_impl for the A/B "
                        "(threefry2x32 reproduces the round-2 numbers)")
    p.add_argument("--iters", type=int, default=ITERS)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ablate_step.json"))
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp

    from mqgan_tpu.core.config import TrainConfig
    from mqgan_tpu.train.state import create_train_state
    from mqgan_tpu.train.step import build_models

    cfg = TrainConfig.from_dict({})
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, generator=dataclasses.replace(
            cfg.model.generator, remat=True)))
    if args.rng_impl:
        cfg = dataclasses.replace(cfg, training=dataclasses.replace(
            cfg.training, rng_impl=args.rng_impl))
    mel_ch = cfg.model.mel_channels
    dt = jnp.bfloat16

    gen, patch, mb = build_models(cfg, dt)
    rng = np.random.default_rng(0)
    mels = [jnp.asarray(rng.standard_normal((B, T, mel_ch)).astype(np.float32))
            for _ in range(args.iters + 1)]
    lens = jnp.full((B,), T, jnp.int32)
    k = jax.random.key(0, impl=cfg.training.rng_impl)
    state0, _, _ = create_train_state(
        gen_variables=jax.jit(gen.init)(k, mels[0], lens),
        patch_variables=jax.jit(patch.init)(k, mels[0], lens),
        multibin_variables=jax.jit(mb.init)(k, mels[0], lens),
        training_cfg=cfg.training, rng=k,
    )
    print("rng_impl:", cfg.training.rng_impl, flush=True)

    variants = args.variants or [
        "full", "nodrop", "nodrop_opt", "pre_only", "fwd_loss", "fwd_det"]
    results = []
    hlo_hash = {}
    for v in variants:
        with variant_patch(v):
            step = build(cfg, v, dt)
            jitted = jax.jit(step, donate_argnums=(0,))
            state = jax.tree_util.tree_map(jnp.copy, state0)
            print(f"compiling {v} ...", flush=True)
            lowered = jitted.lower(state, mels[0], lens)
            hlo_hash[v] = hashlib.sha1(
                lowered.as_text().encode()).hexdigest()[:12]
            if v in ("drop_no_mixers", "drop_mixers_only") and "full" in hlo_hash:
                # guard against the silent-no-op failure mode: the patch
                # must change the traced program, not just the label
                assert hlo_hash[v] != hlo_hash["full"], (
                    f"{v} lowered to the same HLO as 'full' — "
                    "variant_patch did not take effect at trace time")
            compiled = lowered.compile()
        try:
            flops = (compiled.cost_analysis() or {}).get("flops", 0.0)
        except Exception:
            flops = 0.0
        state, l = compiled(state, mels[-1], lens)
        float(np.asarray(l))
        t0 = time.perf_counter()
        outs = []
        for i in range(args.iters):
            state, l = compiled(state, mels[i], lens)
            outs.append(l)
        for l in outs:
            float(np.asarray(l))
        per = (time.perf_counter() - t0) / args.iters
        r = {"variant": v, "hlo": hlo_hash[v],
             "ms_per_step": round(per * 1e3, 1),
             "tflops": round(flops / 1e12, 2),
             "mfu_vs_practical_peak": round(
                 flops / per / PRACTICAL_PEAK, 3) if flops else 0.0}
        print(json.dumps(r), flush=True)
        results.append(r)

    with open(args.out, "w") as f:
        json.dump({"batch": B, "frames": T, "remat": True,
                   "iters": args.iters, "results": results}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
