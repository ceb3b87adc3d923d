"""Normalization layers for (B, T, C) layouts.

The reference's TransposeLayerNorm (attentions.py:37-49) exists only because
PyTorch convs are channels-first; in our channels-last layout it is a plain
LayerNorm over the trailing axis. InstanceNorm matches torch
nn.InstanceNorm1d(affine=True) — per-(sample, channel) stats over time,
track_running_stats=False.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels for (B, T, C); == reference TransposeLayerNorm."""

    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)


class InstanceNorm1d(nn.Module):
    """torch InstanceNorm1d(affine=True) equivalent on (B, T, C): normalize
    over the time axis per (batch, channel), biased variance, eps inside
    sqrt."""

    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
