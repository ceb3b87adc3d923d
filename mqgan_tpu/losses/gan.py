"""LSGAN loss with LeCam regularization — pure functions + explicit state.

Behavioral spec (reference losses.py:5-116): least-squares GAN with masked
MSE to real/fake labels; LeCam keeps EMA buffers of D output means
(decay 0.99) and adds hinge-squared distance penalties to the D loss.

The reference keeps the EMAs as module buffers mutated in-place
(losses.py:17-19,52-58); here they are an explicit `LeCamState` threaded
through the jitted train step — and under data parallelism the masked means
below are computed over the *global* batch by XLA (GSPMD inserts the
cross-replica reductions), so the EMA is replica-synced by construction.

Mask semantics in this file: True = VALID (the discriminators return
patch_mask with True=valid, reference discriminators.py:238).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LeCamState(NamedTuple):
    ema_real: jax.Array  # f32 scalar
    ema_fake: jax.Array  # f32 scalar
    initialized: jax.Array  # bool scalar

    @staticmethod
    def create() -> "LeCamState":
        return LeCamState(
            ema_real=jnp.zeros((), jnp.float32),
            ema_fake=jnp.zeros((), jnp.float32),
            initialized=jnp.zeros((), bool),
        )


def _masked_mse(pred, target, valid_mask=None):
    """Masked mean squared error (reference losses.py:21-35); returns 0 when
    no element is valid."""
    err = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if valid_mask is None:
        return jnp.mean(err)
    m = valid_mask.astype(jnp.float32)
    if m.ndim < err.ndim:
        m = m.reshape(m.shape + (1,) * (err.ndim - m.ndim))
    valid = jnp.sum(m) * (err.size / m.size if m.size != err.size else 1.0)
    total = jnp.sum(err * m)
    return jnp.where(valid > 0, total / jnp.maximum(valid, 1e-12), 0.0)


def _masked_mean(x, valid_mask=None):
    # defined via masked_sum_count so the gradient-accumulation EMA
    # aggregation (train/step.py lecam_chain) is exact BY CONSTRUCTION:
    # _masked_mean(x, m) == sum / max(count, 1), always
    s, c = masked_sum_count(x, valid_mask)
    return s / jnp.maximum(c, 1.0)


def masked_sum_count(x, valid_mask=None):
    """(sum, count) such that ``_masked_mean(x, m) == sum / max(count, 1)``.

    The aggregation primitive behind gradient accumulation: per-microbatch
    (sum, count) pairs add up to the exact full-effective-batch masked mean,
    which per-microbatch means alone cannot reproduce when valid counts
    differ across microbatches."""
    x = x.astype(jnp.float32)
    if valid_mask is None:
        return jnp.sum(x), jnp.asarray(float(x.size), jnp.float32)
    m = valid_mask.astype(jnp.float32)
    scale = x.size / m.size if m.size != x.size else 1.0
    if m.ndim < x.ndim:
        m = m.reshape(m.shape + (1,) * (x.ndim - m.ndim))
    return jnp.sum(x * m), jnp.sum(m) * scale


def update_ema_from_means(
    state: LeCamState, real_mean, fake_mean, decay: float = 0.99
) -> LeCamState:
    """EMA update from precomputed batch means (reference losses.py:37-58:
    first call copies the means, later calls decay them). Split out so the
    gradient-accumulation step can feed means aggregated over the full
    effective batch."""
    real_mean = jax.lax.stop_gradient(real_mean)
    fake_mean = jax.lax.stop_gradient(fake_mean)
    new_real = jnp.where(
        state.initialized, state.ema_real * decay + (1 - decay) * real_mean, real_mean
    )
    new_fake = jnp.where(
        state.initialized, state.ema_fake * decay + (1 - decay) * fake_mean, fake_mean
    )
    return LeCamState(new_real, new_fake, jnp.ones((), bool))


def update_ema(
    state: LeCamState, real_out, fake_out, real_mask=None, fake_mask=None,
    decay: float = 0.99,
) -> LeCamState:
    """reference losses.py:37-58 — batch means of D outputs into the EMA."""
    real_mean = _masked_mean(real_out, real_mask)
    fake_mean = _masked_mean(fake_out, fake_mask)
    return update_ema_from_means(state, real_mean, fake_mean, decay)


def lecam_loss(state: LeCamState, real_out, fake_out, real_mask=None, fake_mask=None):
    """hinge-squared distances to the (updated) EMAs (reference losses.py:60-82)."""
    ema_r = jax.lax.stop_gradient(state.ema_real)
    ema_f = jax.lax.stop_gradient(state.ema_fake)
    term_r = _masked_mean(
        jnp.square(jnp.maximum(real_out.astype(jnp.float32) - ema_f, 0.0)), real_mask
    )
    term_f = _masked_mean(
        jnp.square(jnp.maximum(ema_r - fake_out.astype(jnp.float32), 0.0)), fake_mask
    )
    return term_r + term_f


def discriminator_loss_fixed_ema(
    real_output,
    fake_output,
    real_mask=None,
    fake_mask=None,
    *,
    ema_state: LeCamState,
    real_label: float = 1.0,
    fake_label: float = 0.0,
    use_lecam: bool = True,
):
    """The LSGAN + LeCam D loss with the EMA update factored OUT: the
    penalty uses a caller-provided, already-updated LeCamState. Gradient
    accumulation calls this per microbatch with per-call EMA constants
    aggregated over the full effective batch, so the microbatch gradients
    match the big-batch step's exactly."""
    real_loss = _masked_mse(real_output, jnp.full_like(real_output, real_label), real_mask)
    fake_loss = _masked_mse(fake_output, jnp.full_like(fake_output, fake_label), fake_mask)
    loss = 0.5 * (real_loss + fake_loss)
    if use_lecam:
        loss = loss + lecam_loss(ema_state, real_output, fake_output, real_mask, fake_mask)
    return loss


def discriminator_loss(
    real_output,
    fake_output,
    real_mask=None,
    fake_mask=None,
    *,
    state: LeCamState,
    real_label: float = 1.0,
    fake_label: float = 0.0,
    decay: float = 0.99,
    use_lecam: bool = True,
):
    """Returns (loss, new_state) (reference losses.py:84-108: EMA update
    happens before the LeCam penalty, which uses the updated EMAs)."""
    if use_lecam:
        state = update_ema(state, real_output, fake_output, real_mask, fake_mask, decay)
    loss = discriminator_loss_fixed_ema(
        real_output, fake_output, real_mask, fake_mask, ema_state=state,
        real_label=real_label, fake_label=fake_label, use_lecam=use_lecam,
    )
    return loss, state


def generator_loss(fake_output, fake_mask=None, real_label: float = 1.0):
    """reference losses.py:110-116."""
    return _masked_mse(fake_output, jnp.full_like(fake_output, real_label), fake_mask)


class LSGANLoss:
    """Object wrapper mirroring the reference interface for convenience;
    holds no state — callers thread LeCamState explicitly."""

    def __init__(self, real_label=1.0, fake_label=0.0, decay=0.99, use_lecam=True):
        self.real_label = real_label
        self.fake_label = fake_label
        self.decay = decay
        self.use_lecam = use_lecam

    def discriminator_loss(self, real_output, fake_output, real_mask=None,
                           fake_mask=None, state: LeCamState | None = None):
        state = state if state is not None else LeCamState.create()
        return discriminator_loss(
            real_output, fake_output, real_mask, fake_mask, state=state,
            real_label=self.real_label, fake_label=self.fake_label,
            decay=self.decay, use_lecam=self.use_lecam,
        )

    def generator_loss(self, fake_output, fake_mask=None):
        return generator_loss(fake_output, fake_mask, self.real_label)
