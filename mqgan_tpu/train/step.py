"""The jitted GAN train step.

One fused, compiled function per (bucket-length, phase) pair reproduces the
reference per-batch schedule (train.py:503-539):

  1. generator forward (dropout active)            train.py:524
  2. if epoch >= D-start: D update on (real, stop_grad(fake))
                                                   train.py:527-528, 380-410
  3. G update: recon losses + adversarial (vs the *updated* D) + optional
     feature matching                              train.py:530, 412-501

TPU-first details:
* The generator forward runs ONCE via jax.vjp; the G update pulls gradients
  back through the saved linearization instead of re-running the forward
  (PyTorch equivalent: one forward + one backward).
* Phases are separate compiled variants (static `train_d`): warmup epochs
  compile a graph with no discriminator at all.
* LeCam EMA state and spectral-norm power-iteration stats are explicit
  inputs/outputs — the whole step is a pure function, so it jits, shards,
  and checkpoints trivially.

Reproduced reference quirks (kept for behavioral parity, flagged here):
* the multi-bin D loss reuses bin 0's masks for every bin
  (train.py:391-393, 437) — harmless since all bins share shapes;
* the multi-bin FM loss divides the *accumulated* sum by len(feats) inside
  the per-bin loop, compounding the normalization (train.py:465-474);
* `recon_lambda` from the YAML is dead; effective weights are
  recon_lambda_pre=1.0 / recon_lambda_post=2.0 (train.py:479-482).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from mqgan_tpu.core.config import TrainConfig
from mqgan_tpu.losses.gan import discriminator_loss, generator_loss
from mqgan_tpu.losses.recon import masked_mae, masked_mel_loss
from mqgan_tpu.models.discriminators import (
    MelSpectrogramPatchDiscriminator2D,
    MultiBinDiscriminator,
)
from mqgan_tpu.models.preencoder import PreEncoder
from mqgan_tpu.train.state import TrainState, make_optimizers

Metrics = Dict[str, jax.Array]


def build_models(cfg: TrainConfig, dtype=None):
    gen = PreEncoder.from_config(cfg.model.mel_channels, cfg.model.generator, dtype)
    patch = MelSpectrogramPatchDiscriminator2D.from_config(
        cfg.model.mel_channels, cfg.model.discriminator_patch, dtype
    )
    mb = MultiBinDiscriminator.from_config(
        cfg.model.mel_channels, cfg.model.discriminator_multibin, dtype
    )
    return gen, patch, mb


def make_train_step(
    cfg: TrainConfig,
    *,
    train_d: bool,
    dtype=None,
    donate: bool = True,
    log_grad_norms: bool = False,
) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, Metrics]]:
    """Build a jitted train step for one phase.

    train_d=False == warmup epochs before discriminator_train_start_epoch
    (reference train.py:427,527): pure reconstruction training, no D in the
    compiled graph at all.

    log_grad_norms=True adds per-component gradient L2 norms to the
    metrics (the in-graph half of the wandb.watch equivalent,
    reference train.py:333) — a static variant so the default graph is
    untouched.
    """
    gen, patch, mb = build_models(cfg, dtype)
    gen_tx, disc_tx = make_optimizers(cfg.training)
    w = cfg.training.loss_weights
    use_fm = bool(cfg.training.use_fm_loss) and train_d
    n_bins = cfg.model.discriminator_multibin.n_bins

    recon_all = partial(masked_mel_loss, loss_type="mse", group_size=1)
    # reference uses group_size=16 (train.py:218) and asserts divisibility;
    # for mel counts not divisible by 16, fall back to the largest common
    # divisor so non-reference configs train instead of crashing
    import math

    group = 16 if cfg.model.mel_channels % 16 == 0 else math.gcd(
        cfg.model.mel_channels, 16)
    recon_group = partial(masked_mel_loss, loss_type="mse", group_size=group)

    def step(state: TrainState, mel: jax.Array, lengths: jax.Array):
        rng, r_drop, r_fsq = jax.random.split(state.rng, 3)
        rngs = {"dropout": r_drop, "fsq_noise": r_fsq}

        mel_c = mel.astype(dtype) if dtype is not None else mel

        # ---- 1. generator forward (single pass, saved linearization) ----
        def gen_fwd(gp):
            recon_pre, recon_post, indices = gen.apply(
                {"params": gp}, mel_c, lengths, deterministic=False, rngs=rngs
            )
            return (recon_pre, recon_post), indices

        (recon_pre, recon_post), gen_vjp, indices = jax.vjp(
            gen_fwd, state.gen_params, has_aux=True
        )

        metrics: Metrics = {}

        # ---- 2. discriminator update --------------------------------
        if train_d:
            fake = jax.lax.stop_gradient(recon_post)
            b = mel_c.shape[0]
            # one (2B) batched forward per discriminator instead of separate
            # real/fake calls: convs and SE are per-sample, so each row is
            # bitwise identical to the separate-call result, at half the op
            # count (one spectral-norm power-iteration step per D update,
            # as before)
            both = jnp.concatenate([mel_c, fake], axis=0)
            lengths2 = jnp.concatenate([lengths, lengths], axis=0)

            def d_loss_fn(dp):
                vp = {"params": dp["patch"],
                      "batch_stats": state.disc_stats["patch"]}
                (logits, mask), p_upd = patch.apply(
                    vp, both, lengths2, False, True, mutable=["batch_stats"]
                )
                r_logits, f_logits = logits[:b], logits[b:]
                r_mask, f_mask = mask[:b], mask[b:]
                loss_d1, lecam = discriminator_loss(
                    r_logits, f_logits, r_mask, f_mask, state=state.lecam
                )

                vm = {"params": dp["multibin"],
                      "batch_stats": state.disc_stats["multibin"]}
                (l2, m2), m_upd = mb.apply(
                    vm, both, lengths2, False, True, mutable=["batch_stats"]
                )
                r_l2 = [t[:b] for t in l2]
                f_l2 = [t[b:] for t in l2]
                r_m2 = [t[:b] for t in m2]
                f_m2 = [t[b:] for t in m2]

                loss_mbd = jnp.zeros((), jnp.float32)
                for i in range(n_bins):
                    # reference quirk: bin 0's masks for every bin
                    # (train.py:391-393)
                    li, lecam = discriminator_loss(
                        r_l2[i], f_l2[i], r_m2[0], f_m2[0], state=lecam
                    )
                    loss_mbd = loss_mbd + li
                loss_mbd = loss_mbd / n_bins

                new_stats = {
                    "patch": p_upd["batch_stats"],
                    "multibin": m_upd["batch_stats"],
                }
                return loss_d1 + loss_mbd, (lecam, new_stats)

            (loss_d, (new_lecam, new_stats)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.disc_params)
            d_updates, new_disc_opt = disc_tx.update(
                d_grads, state.disc_opt, state.disc_params
            )
            new_disc_params = optax.apply_updates(state.disc_params, d_updates)
            metrics["loss_d"] = loss_d
            if log_grad_norms:
                metrics["grad_norm/disc"] = optax.global_norm(d_grads)
        else:
            new_disc_params = state.disc_params
            new_disc_opt = state.disc_opt
            new_stats = state.disc_stats
            new_lecam = state.lecam
            metrics["loss_d"] = jnp.zeros((), jnp.float32)

        # ---- 3. generator update (vs the UPDATED discriminators) -----
        def g_out_loss(outs):
            r_pre, r_post = outs
            loss_recon_pre = recon_all(r_pre, mel, lengths) + 0.25 * recon_group(
                r_pre, mel, lengths
            )
            loss_recon_post = recon_all(r_post, mel, lengths) + 0.25 * recon_group(
                r_post, mel, lengths
            )

            loss_gan = jnp.zeros((), jnp.float32)
            loss_fm = jnp.zeros((), jnp.float32)
            if train_d:
                vp = {"params": new_disc_params["patch"],
                      "batch_stats": new_stats["patch"]}
                vm = {"params": new_disc_params["multibin"],
                      "batch_stats": new_stats["multibin"]}
                if use_fm:
                    # batch generated + real rows (real needed for FM): one
                    # forward per D; real rows carry no gradient (stop_grad
                    # below), generated rows are bitwise identical to a
                    # separate call
                    both_g = jnp.concatenate([r_post, mel_c], axis=0)
                    gl, gm, gf = patch.apply(vp, both_g, lengths2, True)
                    g_logits, g_mask = gl[:b], gm[:b]
                    g_feats = [(f[:b], m[:b]) for f, m in gf]
                    real_feats = [
                        (jax.lax.stop_gradient(f[b:]), m[b:]) for f, m in gf
                    ]
                    l2g, m2g, f2g = mb.apply(vm, both_g, lengths2, True)
                    g_l2 = [t[:b] for t in l2g]
                    g_m2 = [t[:b] for t in m2g]
                    g_f2 = [[(f[:b], m[:b]) for f, m in fs] for fs in f2g]
                    real_f2 = [
                        [(jax.lax.stop_gradient(f[b:]), m[b:]) for f, m in fs]
                        for fs in f2g
                    ]
                else:
                    g_logits, g_mask, g_feats = patch.apply(
                        vp, r_post, lengths, True
                    )
                    g_l2, g_m2, g_f2 = mb.apply(vm, r_post, lengths, True)

                loss_gan_d1 = generator_loss(g_logits, g_mask)
                loss_gan_mbd = jnp.zeros((), jnp.float32)
                for i in range(n_bins):
                    # reference quirk: bin 0's mask (train.py:437)
                    loss_gan_mbd = loss_gan_mbd + generator_loss(g_l2[i], g_m2[0])
                loss_gan_mbd = loss_gan_mbd / n_bins
                loss_gan = 0.5 * (loss_gan_d1 + loss_gan_mbd)

                if use_fm:
                    # real_feats / real_f2 came out of the batched forward
                    # above, already stop_grad'ed
                    loss_fm_d1 = jnp.zeros((), jnp.float32)
                    for (rf, rmask), (ff, _) in zip(real_feats, g_feats):
                        loss_fm_d1 = loss_fm_d1 + masked_mae(ff, rf, rmask)
                    if len(real_feats) > 0:
                        loss_fm_d1 = loss_fm_d1 / len(real_feats)

                    loss_fm_mbd = jnp.zeros((), jnp.float32)
                    for i in range(len(g_f2)):
                        for (rf, rmask), (ff, _) in zip(real_f2[i], g_f2[i]):
                            loss_fm_mbd = loss_fm_mbd + masked_mae(ff, rf, rmask)
                        if len(real_f2[i]) > 0:
                            # reference quirk: compounding division
                            # (train.py:465-474)
                            loss_fm_mbd = loss_fm_mbd / len(real_f2[i])
                    if len(g_f2) > 0:
                        loss_fm_mbd = loss_fm_mbd / len(g_f2)
                    loss_fm = 0.5 * (loss_fm_d1 + loss_fm_mbd)

            gloss_lambda = w.Gloss_lambda if train_d else 0.0
            fm_lambda = w.fm_lambda if use_fm else 0.0
            total = (
                loss_recon_pre * w.recon_lambda_pre
                + loss_recon_post * w.recon_lambda_post
                + loss_gan * gloss_lambda
                + loss_fm * fm_lambda
            )
            return total, {
                "loss_g_total": total,
                "loss_recon_pre": loss_recon_pre,
                "loss_recon_post": loss_recon_post,
                "loss_gan": loss_gan,
                "loss_fm": loss_fm,
            }

        (_, g_metrics), out_grads = jax.value_and_grad(
            g_out_loss, has_aux=True
        )((recon_pre, recon_post))
        (gen_grads,) = gen_vjp(out_grads)
        if log_grad_norms:
            metrics["grad_norm/gen"] = optax.global_norm(gen_grads)
            for comp, sub in gen_grads.items():
                metrics[f"grad_norm/gen/{comp}"] = optax.global_norm(sub)
        g_updates, new_gen_opt = gen_tx.update(
            gen_grads, state.gen_opt, state.gen_params
        )
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics.update(g_metrics)
        metrics["learning_rate"] = cfg.training.lr * jnp.minimum(
            (state.step + 1.0) / cfg.training.warmup_steps, 1.0
        )
        # codebook health: fraction of the implicit codebook used this batch
        cb = 1
        for level in cfg.model.generator.fsq_levels:
            cb *= level
        usage = jnp.zeros((cb,), jnp.int32).at[indices.reshape(-1)].add(1)
        metrics["codebook_usage"] = jnp.mean((usage > 0).astype(jnp.float32))
        # entropy-based collapse signal: perplexity of this batch's code
        # distribution (== cb when uniform, -> 1 under collapse); usage
        # fraction alone can look healthy while mass concentrates
        p = usage.astype(jnp.float32) / jnp.maximum(jnp.sum(usage), 1)
        ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))
        metrics["codebook_perplexity"] = jnp.exp(ent)

        new_state = TrainState(
            step=state.step + 1,
            gen_params=new_gen_params,
            gen_opt=new_gen_opt,
            disc_params=new_disc_params,
            disc_stats=new_stats,
            disc_opt=new_disc_opt,
            lecam=new_lecam,
            rng=rng,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: TrainConfig, dtype=None):
    """No-grad forward returning (recon_pre, recon_post, metrics)."""
    gen, _, _ = build_models(cfg, dtype)

    @jax.jit
    def eval_step(gen_params, mel, lengths):
        recon_pre, recon_post, indices = gen.apply(
            {"params": gen_params}, mel, lengths, deterministic=True
        )
        metrics = {
            "eval_recon_pre_mse": masked_mel_loss(
                recon_pre, mel, lengths, loss_type="mse"
            ),
            "eval_recon_post_mse": masked_mel_loss(
                recon_post, mel, lengths, loss_type="mse"
            ),
        }
        return recon_pre, recon_post, indices, metrics

    return eval_step
