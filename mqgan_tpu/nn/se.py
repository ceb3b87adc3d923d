"""Masked Squeeze-and-Excitation for NHWC images.

Behavioral spec: reference discriminators.py:10-67 — squeeze = masked global
average over (H, W); excitation = FC -> ReLU -> FC -> sigmoid per-channel
scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ChannelSELayerMasked(nn.Module):
    num_channels: int
    reduction_ratio: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array | None = None) -> jax.Array:
        """x: (B, H, W, C); pad_mask: (B, H, W) True = padded."""
        if pad_mask is None:
            squeeze = jnp.mean(x, axis=(1, 2))  # (B, C)
        else:
            valid = (~pad_mask).astype(x.dtype)[..., None]  # (B, H, W, 1)
            denom = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1.0)  # (B, 1)
            squeeze = jnp.sum(x * valid, axis=(1, 2)) / denom

        reduced = max(1, self.num_channels // self.reduction_ratio)
        e = nn.Dense(reduced, dtype=self.dtype, name="fc1")(squeeze)
        e = nn.relu(e)
        e = nn.Dense(self.num_channels, dtype=self.dtype, name="fc2")(e)
        excite = nn.sigmoid(e)  # (B, C)
        return x * excite[:, None, None, :]
