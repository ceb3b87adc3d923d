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
* grad_accum=N runs the same schedule as N lax.scan'ed microbatches with
  one optimizer update per phase — activation memory scales with B/N (the
  memory knob for effective batches that OOM in one pass), and the LeCam
  EMA chain is rebuilt from logit sums aggregated across ALL microbatches
  so its trajectory equals the big-batch step's.

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
from mqgan_tpu.losses.gan import (
    discriminator_loss,
    discriminator_loss_fixed_ema,
    generator_loss,
    masked_sum_count,
    update_ema_from_means,
)
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
    grad_accum: int = 1,
    mesh=None,
    ema_decay: float = 0.0,
) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, Metrics]]:
    """Build a jitted train step for one phase.

    train_d=False == warmup epochs before discriminator_train_start_epoch
    (reference train.py:427,527): pure reconstruction training, no D in the
    compiled graph at all.

    log_grad_norms=True adds per-component gradient L2 norms to the
    metrics (the in-graph half of the wandb.watch equivalent,
    reference train.py:333) — a static variant so the default graph is
    untouched.

    ema_decay>0 maintains an exponential moving average of the generator
    params in state.gen_ema (updated after each optimizer step:
    ema = decay*ema + (1-decay)*params — the standard GAN deploy/eval
    weights; no reference counterpart). state.gen_ema must be a params
    tree (the trainer seeds it with a copy of gen_params).

    grad_accum=N accepts the same (B, T, C) batch but processes it as N
    scanned microbatches of B/N rows (one optimizer update per phase,
    exactly as before). Numerics match the one-pass step whenever the
    per-loss-term valid counts are equal across microbatches — in
    particular for pad-free batches, the common case since collate crops
    every row to one bucket length (tests/test_train_step.py pins the
    equality). Rows are striped over microbatches so a short final
    batch's zero-length fill rows (train/data.py) spread evenly instead
    of concentrating in one microbatch; with real-row counts divisible
    by N this keeps the equality exact even on fill-padded batches
    (also test-pinned), and otherwise bounds the imbalance to one row. Cost: one extra generator forward and one extra
    discriminator forward per step (a saved vjp linearization cannot cross
    the D update in scanned form). `mesh` (optional) re-shards every
    microbatch over the full mesh so data parallelism keeps using all
    devices.
    """
    gen, patch, mb = build_models(cfg, dtype)
    gen_tx, disc_tx = make_optimizers(cfg.training)
    w = cfg.training.loss_weights
    use_fm = bool(cfg.training.use_fm_loss) and train_d
    n_bins = cfg.model.discriminator_multibin.n_bins
    n_calls = 1 + n_bins  # D loss calls per step: patch, then each bin

    recon_all = partial(masked_mel_loss, loss_type="mse", group_size=1)
    # reference uses group_size=16 (train.py:218) and asserts divisibility;
    # for mel counts not divisible by 16, fall back to the largest common
    # divisor so non-reference configs train instead of crashing
    import math

    group = 16 if cfg.model.mel_channels % 16 == 0 else math.gcd(
        cfg.model.mel_channels, 16)
    recon_group = partial(masked_mel_loss, loss_type="mse", group_size=group)

    cb = 1
    for level in cfg.model.generator.fsq_levels:
        cb *= level

    def codebook_metrics(usage: jax.Array) -> Metrics:
        """Codebook health from a code-usage histogram: fraction of the
        implicit codebook used this batch + perplexity of the batch's code
        distribution (== cb when uniform, -> 1 under collapse); usage
        fraction alone can look healthy while mass concentrates."""
        p = usage.astype(jnp.float32) / jnp.maximum(jnp.sum(usage), 1)
        ent = -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))
        return {
            "codebook_usage": jnp.mean((usage > 0).astype(jnp.float32)),
            "codebook_perplexity": jnp.exp(ent),
        }

    def d_forward(dp, stats, both, lengths2, b):
        """One batched real+fake forward per discriminator (convs/SE are
        per-sample, so each row is bitwise identical to separate real/fake
        calls at half the op count). Returns the per-loss-call
        (real_logits, fake_logits, real_mask, fake_mask) tuples in the
        reference's call order [patch, bin 0..n_bins-1] — every bin reuses
        bin 0's masks (reference quirk train.py:391-393) — plus the updated
        spectral-norm power-iteration stats (one step per D update, as
        before)."""
        vp = {"params": dp["patch"], "batch_stats": stats["patch"]}
        (logits, mask), p_upd = patch.apply(
            vp, both, lengths2, False, True, mutable=["batch_stats"]
        )
        calls = [(logits[:b], logits[b:], mask[:b], mask[b:])]

        vm = {"params": dp["multibin"], "batch_stats": stats["multibin"]}
        (l2, m2), m_upd = mb.apply(
            vm, both, lengths2, False, True, mutable=["batch_stats"]
        )
        for i in range(n_bins):
            calls.append((l2[i][:b], l2[i][b:], m2[0][:b], m2[0][b:]))

        new_stats = {
            "patch": p_upd["batch_stats"],
            "multibin": m_upd["batch_stats"],
        }
        return calls, new_stats

    def g_total_loss(outs, mel_t, mel_c_in, lengths, disc_params, disc_stats):
        """Generator loss terms vs the given (already-updated)
        discriminators — reference train.py:412-501. mel_t is the fp32
        recon target; mel_c_in the compute-dtype input the FM loss feeds
        back through the discriminators as the 'real' branch."""
        r_pre, r_post = outs
        loss_recon_pre = recon_all(r_pre, mel_t, lengths) + 0.25 * recon_group(
            r_pre, mel_t, lengths
        )
        loss_recon_post = recon_all(r_post, mel_t, lengths) + 0.25 * recon_group(
            r_post, mel_t, lengths
        )

        loss_gan = jnp.zeros((), jnp.float32)
        loss_fm = jnp.zeros((), jnp.float32)
        if train_d:
            b = r_post.shape[0]
            vp = {"params": disc_params["patch"],
                  "batch_stats": disc_stats["patch"]}
            vm = {"params": disc_params["multibin"],
                  "batch_stats": disc_stats["multibin"]}
            if use_fm:
                # batch generated + real rows (real needed for FM): one
                # forward per D; real rows carry no gradient (stop_grad
                # below), generated rows are bitwise identical to a
                # separate call
                lengths2 = jnp.concatenate([lengths, lengths], axis=0)
                both_g = jnp.concatenate([r_post, mel_c_in], axis=0)
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

    def ema_update(old_ema, new_params):
        if ema_decay <= 0.0:
            return old_ema
        d = ema_decay
        return jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                            old_ema, new_params)

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
            both = jnp.concatenate([mel_c, fake], axis=0)
            lengths2 = jnp.concatenate([lengths, lengths], axis=0)

            def d_loss_fn(dp):
                calls, new_stats = d_forward(
                    dp, state.disc_stats, both, lengths2, b)
                loss_d1, lecam = discriminator_loss(
                    *calls[0], state=state.lecam
                )
                loss_mbd = jnp.zeros((), jnp.float32)
                for i in range(n_bins):
                    li, lecam = discriminator_loss(*calls[1 + i], state=lecam)
                    loss_mbd = loss_mbd + li
                loss_mbd = loss_mbd / n_bins
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
        (_, g_metrics), out_grads = jax.value_and_grad(
            g_total_loss, has_aux=True
        )((recon_pre, recon_post), mel, mel_c, lengths,
          new_disc_params, new_stats)
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
        usage = jnp.zeros((cb,), jnp.int32).at[indices.reshape(-1)].add(1)
        metrics.update(codebook_metrics(usage))

        new_state = TrainState(
            step=state.step + 1,
            gen_params=new_gen_params,
            gen_opt=new_gen_opt,
            disc_params=new_disc_params,
            disc_stats=new_stats,
            disc_opt=new_disc_opt,
            lecam=new_lecam,
            rng=rng,
            gen_ema=ema_update(state.gen_ema, new_gen_params),
        )
        return new_state, metrics

    def step_accum(state: TrainState, mel: jax.Array, lengths: jax.Array):
        n = grad_accum
        big_b = mel.shape[0]
        assert big_b % n == 0, (
            f"batch {big_b} not divisible by grad_accum {n}")
        b = big_b // n
        # STRIPE rows over microbatches (microbatch k gets original rows
        # k, k+n, k+2n, ...): per-microbatch losses are averaged with
        # equal 1/n weight, so the per-term valid counts must be as equal
        # as possible across microbatches or samples get re-weighted by
        # their microbatch's count. The loader's zero-length fill rows on
        # a short final batch sit CONTIGUOUSLY at the end — without
        # striping a microbatch can be all-fill (loss 0, zero grads),
        # halving that step's gradients. Striping balances real/fill rows
        # to within one row per microbatch; a pure row permutation, so
        # the one-pass step's semantics are untouched.
        stripe = jnp.arange(big_b).reshape(b, n).T.reshape(-1)
        mel = mel[stripe]
        lengths = lengths[stripe]
        rng, r_drop, r_fsq = jax.random.split(state.rng, 3)
        mel_c_full = mel.astype(dtype) if dtype is not None else mel
        zero = jnp.zeros((), jnp.float32)

        def micro(arr, i):
            """Rows [i*b, (i+1)*b) of a batch-leading array; re-sharded over
            the mesh so every device works on every microbatch (a
            contiguous row slice of a data-sharded batch otherwise lands on
            a device subset)."""
            sl = jax.lax.dynamic_slice_in_dim(arr, i * b, b, axis=0)
            if mesh is not None and mesh.devices.size > 1:
                from mqgan_tpu.parallel.mesh import train_array_sharding

                sl = jax.lax.with_sharding_constraint(
                    sl, train_array_sharding(mesh, sl.ndim))
            return sl

        def micro_rngs(i):
            return {
                "dropout": jax.random.fold_in(r_drop, i),
                "fsq_noise": jax.random.fold_in(r_fsq, i),
            }

        def gen_fwd_micro(gp, i):
            recon_pre, recon_post, indices = gen.apply(
                {"params": gp}, micro(mel_c_full, i), micro(lengths, i),
                deterministic=False, rngs=micro_rngs(i)
            )
            return (recon_pre, recon_post), indices

        metrics: Metrics = {}

        if train_d:
            # ---- scan 1: forward-only — stash the fakes and per-call
            # logit (sum, count) pairs so the LeCam EMA chain can be built
            # from FULL-effective-batch means before any microbatch's D
            # gradient is taken (the plain step's EMA update sees big-batch
            # means; per-microbatch threading would diverge from it) ----
            def fwd_one(carry, i):
                sums, _ = carry
                (_, post), _idx = gen_fwd_micro(state.gen_params, i)
                fake = jax.lax.stop_gradient(post)
                len_i = micro(lengths, i)
                both = jnp.concatenate([micro(mel_c_full, i), fake], axis=0)
                lengths2 = jnp.concatenate([len_i, len_i], axis=0)
                calls, stats_i = d_forward(
                    state.disc_params, state.disc_stats, both, lengths2, b)
                rows = []
                for r_l, f_l, r_m, f_m in calls:
                    sr, cr = masked_sum_count(r_l, r_m)
                    sf, cf = masked_sum_count(f_l, f_m)
                    rows.append(jnp.stack([sr, cr, sf, cf]))
                # the power iteration depends only on the (fixed) weights,
                # so every microbatch proposes the same stats update — keep
                # the last
                return (sums + jnp.stack(rows), stats_i), fake

            (sums, new_stats), fakes = jax.lax.scan(
                fwd_one,
                (jnp.zeros((n_calls, 4), jnp.float32), state.disc_stats),
                jnp.arange(n),
            )

            # the exact big-batch EMA chain, in the reference's call order
            # (patch, then each bin — reference losses.py:84-108 updates
            # the EMA before each penalty)
            lecam_chain = []
            s = state.lecam
            for c in range(n_calls):
                mean_r = sums[c, 0] / jnp.maximum(sums[c, 1], 1.0)
                mean_f = sums[c, 2] / jnp.maximum(sums[c, 3], 1.0)
                s = update_ema_from_means(s, mean_r, mean_f)
                lecam_chain.append(s)
            new_lecam = s

            # ---- scan 2: D gradients, averaged over microbatches ----
            def d_loss_micro(dp, i, fake):
                len_i = micro(lengths, i)
                both = jnp.concatenate([micro(mel_c_full, i), fake], axis=0)
                lengths2 = jnp.concatenate([len_i, len_i], axis=0)
                calls, _ = d_forward(dp, state.disc_stats, both, lengths2, b)
                loss_d1 = discriminator_loss_fixed_ema(
                    *calls[0], ema_state=lecam_chain[0])
                loss_mbd = zero
                for j in range(n_bins):
                    loss_mbd = loss_mbd + discriminator_loss_fixed_ema(
                        *calls[1 + j], ema_state=lecam_chain[1 + j])
                return loss_d1 + loss_mbd / n_bins

            def d_grad_one(carry, xs):
                i, fake = xs
                g_acc, l_acc = carry
                loss_i, grads_i = jax.value_and_grad(d_loss_micro)(
                    state.disc_params, i, fake)
                return (jax.tree.map(jnp.add, g_acc, grads_i),
                        l_acc + loss_i), None

            (d_gsum, d_lsum), _ = jax.lax.scan(
                d_grad_one,
                (jax.tree.map(jnp.zeros_like, state.disc_params), zero),
                (jnp.arange(n), fakes),
            )
            d_grads = jax.tree.map(lambda g: g / n, d_gsum)
            d_updates, new_disc_opt = disc_tx.update(
                d_grads, state.disc_opt, state.disc_params
            )
            new_disc_params = optax.apply_updates(state.disc_params, d_updates)
            metrics["loss_d"] = d_lsum / n
            if log_grad_norms:
                metrics["grad_norm/disc"] = optax.global_norm(d_grads)
        else:
            new_disc_params = state.disc_params
            new_disc_opt = state.disc_opt
            new_stats = state.disc_stats
            new_lecam = state.lecam
            metrics["loss_d"] = zero

        # ---- scan 3: G gradients vs the UPDATED discriminators. The
        # generator re-forwards per microbatch with the SAME rng folds as
        # scan 1, so the fakes the D update saw and the outputs the G loss
        # differentiates are identical ----
        def g_grad_one(carry, i):
            g_acc, m_acc, usage_acc = carry
            outs, gen_vjp, idx = jax.vjp(
                lambda gp: gen_fwd_micro(gp, i), state.gen_params,
                has_aux=True,
            )
            (_, g_metrics), out_grads = jax.value_and_grad(
                g_total_loss, has_aux=True
            )(outs, micro(mel, i), micro(mel_c_full, i), micro(lengths, i),
              new_disc_params, new_stats)
            (gen_grads_i,) = gen_vjp(out_grads)
            return (jax.tree.map(jnp.add, g_acc, gen_grads_i),
                    jax.tree.map(jnp.add, m_acc, g_metrics),
                    usage_acc.at[idx.reshape(-1)].add(1)), None

        m_init = {k: zero for k in (
            "loss_g_total", "loss_recon_pre", "loss_recon_post",
            "loss_gan", "loss_fm")}
        (g_gsum, g_msum, usage), _ = jax.lax.scan(
            g_grad_one,
            (jax.tree.map(jnp.zeros_like, state.gen_params), m_init,
             jnp.zeros((cb,), jnp.int32)),
            jnp.arange(n),
        )
        gen_grads = jax.tree.map(lambda g: g / n, g_gsum)
        if log_grad_norms:
            metrics["grad_norm/gen"] = optax.global_norm(gen_grads)
            for comp, sub in gen_grads.items():
                metrics[f"grad_norm/gen/{comp}"] = optax.global_norm(sub)
        g_updates, new_gen_opt = gen_tx.update(
            gen_grads, state.gen_opt, state.gen_params
        )
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics.update({k: v / n for k, v in g_msum.items()})
        metrics["learning_rate"] = cfg.training.lr * jnp.minimum(
            (state.step + 1.0) / cfg.training.warmup_steps, 1.0
        )
        metrics.update(codebook_metrics(usage))

        new_state = TrainState(
            step=state.step + 1,
            gen_params=new_gen_params,
            gen_opt=new_gen_opt,
            disc_params=new_disc_params,
            disc_stats=new_stats,
            disc_opt=new_disc_opt,
            lecam=new_lecam,
            rng=rng,
            gen_ema=ema_update(state.gen_ema, new_gen_params),
        )
        return new_state, metrics

    fn = step_accum if grad_accum > 1 else step
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


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
