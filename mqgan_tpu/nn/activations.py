"""Activations.

APTx — (alpha + tanh(beta*x)) * gamma * x — behavioral spec at reference
attentions.py:9-35. The trainable variant ("taptx") learns beta/gamma.
Elementwise, so XLA fuses it into neighboring convs; beta/gamma stay fp32
params and are cast to the compute dtype at use.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def aptx(x, alpha=1.0, beta=1.0, gamma=0.5):
    dtype = x.dtype
    return (
        jnp.asarray(alpha, dtype) + jnp.tanh(jnp.asarray(beta, dtype) * x)
    ) * jnp.asarray(gamma, dtype) * x


class APTx(nn.Module):
    alpha: float = 1.0
    beta: float = 1.0
    gamma: float = 0.5
    trainable: bool = False

    @nn.compact
    def __call__(self, x):
        if self.trainable:
            beta = self.param("beta", lambda k: jnp.asarray(self.beta, jnp.float32))
            gamma = self.param("gamma", lambda k: jnp.asarray(self.gamma, jnp.float32))
        else:
            beta, gamma = self.beta, self.gamma
        return aptx(x, self.alpha, beta, gamma)


def make_activation(name: str) -> nn.Module:
    """Activation factory matching reference ResidualBlock1D act choices
    (attentions.py:512-519)."""
    if name == "taptx":
        return APTx(trainable=True)
    if name == "aptx":
        return APTx()
    if name == "relu":
        return ReLU()
    if name == "gelu":
        return GELU()
    raise ValueError(f"Unknown activation: {name}")


class ReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.relu(x)


class GELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.gelu(x)


class LeakyReLU(nn.Module):
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(x, self.negative_slope)
