"""Training state + optimizer construction.

One pytree holds everything the jitted step mutates — generator/discriminator
params, both optax states, spectral-norm power-iteration stats, the LeCam
EMA state, the PRNG key, and the step counter. Checkpointing (orbax) and the
reference's generator-only warm-start (train.py:362-378) operate on this
structure.

Optimizer parity with the reference (train.py:312-329):
  G: Adam(lr, beta1, beta2) with linear warmup lr-lambda min((s+1)/warmup, 1)
  D: Adam(lr * lr_d_factor, d_beta1, d_beta2), one optimizer over patch +
     multibin jointly
  both: global-norm grad clip 1.0 applied before the update.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mqgan_tpu.core.config import TrainingConfig
from mqgan_tpu.losses.gan import LeCamState


@struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar, counts G updates
    gen_params: Any
    gen_opt: Any
    disc_params: Any  # {'patch': ..., 'multibin': ...}
    disc_stats: Any  # spectral-norm batch_stats {'patch': ..., 'multibin': ...}
    disc_opt: Any
    lecam: LeCamState
    rng: jax.Array
    # exponential moving average of gen_params (net-new vs the reference:
    # the standard GAN eval/deploy weights — updated in-step when the
    # trainer enables --ema, else stays None and costs nothing)
    gen_ema: Any = None


def warmup_schedule(lr: float, warmup_steps: int):
    """reference train.py:327: lr * min((step+1)/warmup_steps, 1.0)."""

    def schedule(count):
        return lr * jnp.minimum((count + 1.0) / float(warmup_steps), 1.0)

    return schedule


def make_optimizers(cfg: TrainingConfig):
    gen_tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad_norm),
        optax.adam(
            learning_rate=warmup_schedule(cfg.lr, cfg.warmup_steps),
            b1=cfg.beta1,
            b2=cfg.beta2,
        ),
    )
    disc_tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad_norm),
        optax.adam(
            learning_rate=cfg.lr * cfg.lr_d_factor,
            b1=cfg.d_beta1,
            b2=cfg.d_beta2,
        ),
    )
    return gen_tx, disc_tx


def create_train_state(
    *,
    gen_variables: Any,
    patch_variables: Any,
    multibin_variables: Any,
    training_cfg: TrainingConfig,
    rng: jax.Array,
) -> tuple[TrainState, Any, Any]:
    """Build the initial TrainState from freshly initialized model variables.

    Returns (state, gen_tx, disc_tx); the txs are needed by the step fn.
    """
    gen_tx, disc_tx = make_optimizers(training_cfg)
    gen_params = gen_variables["params"]
    disc_params = {
        "patch": patch_variables["params"],
        "multibin": multibin_variables["params"],
    }
    disc_stats = {
        "patch": patch_variables.get("batch_stats", {}),
        "multibin": multibin_variables.get("batch_stats", {}),
    }
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_opt=gen_tx.init(gen_params),
        disc_params=disc_params,
        disc_stats=disc_stats,
        disc_opt=disc_tx.init(disc_params),
        lecam=LeCamState.create(),
        rng=rng,
    )
    return state, gen_tx, disc_tx
