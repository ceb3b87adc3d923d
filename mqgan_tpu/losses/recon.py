"""Reconstruction + feature-matching losses.

* MaskedMelLoss — Charbonnier or MSE per frequency-group so every sub-band
  counts equally (behavioral spec: reference losses.py:121-182).
* masked_mae — masked L1 feature matching (reference train.py:38-45).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mqgan_tpu.core.masking import sequence_mask


def masked_mel_loss(
    x: jax.Array,  # (B, T, C)
    y: jax.Array,  # (B, T, C)
    lengths: jax.Array,  # (B,)
    *,
    loss_type: str = "charbonnier",
    group_size: int = 1,
    eps: float = 1e-6,
) -> jax.Array:
    assert x.shape == y.shape
    b, t, c = x.shape
    g = group_size
    assert c % g == 0, "C (n_mels) must be divisible by group_size"
    n_groups = c // g

    pad = sequence_mask(t, lengths)  # (B, T) True=pad
    diff = x.astype(jnp.float32) - y.astype(jnp.float32)
    if loss_type == "charbonnier":
        per_elem = jnp.sqrt(jnp.square(diff) + eps * eps)
    elif loss_type == "mse":
        per_elem = jnp.square(diff)
    else:
        raise ValueError(loss_type)

    per_elem = jnp.where(pad[..., None], 0.0, per_elem)
    per_elem = per_elem.reshape(b, t, n_groups, g)
    group_sum = jnp.sum(per_elem, axis=(0, 1, 3))  # (G,)
    valid_per_frame = jnp.sum(~pad) * g  # scalar, same for every group
    group_loss = group_sum / (valid_per_frame.astype(jnp.float32) + 1e-12)
    return jnp.mean(group_loss)


class MaskedMelLoss:
    """Configured callable mirroring the reference module interface."""

    def __init__(self, loss_type: str = "charbonnier", group_size: int = 1,
                 eps: float = 1e-6):
        assert loss_type in ("charbonnier", "mse")
        self.loss_type = loss_type
        self.group_size = group_size
        self.eps = eps

    def __call__(self, x, y, lengths):
        return masked_mel_loss(
            x, y, lengths, loss_type=self.loss_type,
            group_size=self.group_size, eps=self.eps,
        )


def masked_mae(pred: jax.Array, target: jax.Array, pad_mask: jax.Array,
               eps: float = 1e-8) -> jax.Array:
    """Masked mean absolute error between discriminator feature maps
    (reference train.py:38-45). pad_mask True = padded; broadcast over the
    channel axis like the reference's expand_as."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    m = pad_mask
    if m.ndim < diff.ndim:
        m = m.reshape(m.shape + (1,) * (diff.ndim - m.ndim))
    m = jnp.broadcast_to(m, diff.shape)
    diff = jnp.where(m, 0.0, diff)
    valid_cnt = jnp.sum(~m).astype(jnp.float32)
    return jnp.sum(diff) / (valid_cnt + eps)
