"""ResidualBlock1D — the generator's core op.

Behavioral spec (reference attentions.py:476-551):
conv1 -> norm1 -> mask -> act -> conv2 -> norm2 -> [CBAM if non-causal]
-> + residual (1x1 proj if channels change) -> mask -> act -> dropout.
Causal mode swaps in left-padded convs and drops CBAM; norm in
{weight, layer, instance} ("weight" = weight-normed convs + identity norms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.core.masking import apply_mask
from mqgan_tpu.nn.activations import make_activation
from mqgan_tpu.nn.attention import CBAM1D
from mqgan_tpu.nn.conv import conv1d
from mqgan_tpu.nn.norm import ChannelLayerNorm, InstanceNorm1d


class ResidualBlock1D(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    dropout: float = 0.3
    act: str = "relu"
    causal: bool = False
    norm: str = "layer"  # "weight" | "layer" | "instance"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        pad_mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        assert self.norm in ("weight", "layer", "instance"), self.norm
        wn = self.norm == "weight"

        conv_a = conv1d(
            self.out_channels, self.kernel_size, dilation=self.dilation,
            causal=self.causal, use_weight_norm=wn, dtype=self.dtype, name="conv1",
        )
        conv_b = conv1d(
            self.out_channels, self.kernel_size, dilation=self.dilation,
            causal=self.causal, use_weight_norm=wn, dtype=self.dtype, name="conv2",
        )

        def make_norm(name):
            if self.norm == "layer":
                return ChannelLayerNorm(dtype=self.dtype, name=name)
            if self.norm == "instance":
                return InstanceNorm1d(self.out_channels, dtype=self.dtype, name=name)
            return lambda y: y  # "weight": identity norms

        act = make_activation(self.act)

        if self.in_channels != self.out_channels:
            residual = conv1d(
                self.out_channels, 1, use_weight_norm=False, dtype=self.dtype,
                name="residual",
            )(x)
        else:
            residual = x

        out = conv_a(x)
        out = make_norm("norm1")(out)
        out = apply_mask(out, pad_mask)
        out = act(out)

        out = conv_b(out)
        out = make_norm("norm2")(out)
        if not self.causal:
            out = CBAM1D(
                channels=self.out_channels, causal=False, dtype=self.dtype,
                name="cbam",
            )(out, pad_mask if pad_mask is not None else jnp.zeros(out.shape[:2], bool))
        out = out + residual
        out = apply_mask(out, pad_mask)
        out = act(out)
        out = nn.Dropout(rate=self.dropout, deterministic=deterministic)(out)
        return out
