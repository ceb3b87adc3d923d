"""MelMixer2D — the generator's "mel-mixer" block.

Behavioral spec (reference ConvBlock2D, preencoder.py:205-301, as used at
preencoder.py:322,351): treat the (channels, time) feature plane as a 1-chan
image; depthwise 5x5 weight-norm conv + pointwise expansion to `features`
planes, mask, APTx, dropout, then 1x1 conv back to a single plane.

Layout here: input (B, T, C) -> image (B, T, C, 1) NHWC; the mask (B, T)
broadcasts along the channel-as-space axis exactly like the reference's
(B,1,1,T) mask broadcast over H.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.core.masking import apply_mask
from mqgan_tpu.nn.activations import make_activation
from mqgan_tpu.nn.conv import WNConv


class MelMixer2D(nn.Module):
    features: int  # pointwise expansion width (== channels[0] in reference)
    kernel_size: int = 5
    depthwise: bool = True
    use_weight_norm: bool = True
    act: str = "aptx"
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, C)
        pad_mask: jax.Array | None = None,  # (B, T)
        deterministic: bool = True,
        return_hidden: bool = False,
    ):
        img = x[..., None]  # (B, T, C, 1)

        def mask4(t):
            if pad_mask is None:
                return t
            return jnp.where(pad_mask[:, :, None, None], jnp.zeros((), t.dtype), t)

        k = (self.kernel_size, self.kernel_size)
        if self.depthwise:
            # input has 1 plane, so depthwise == a single 5x5 conv, then the
            # pointwise expansion (reference _make_conv with groups=in_ch=1).
            out = WNConv(1, k, use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="dw")(img)
            out = mask4(out)
            out = WNConv(self.features, (1, 1),
                         use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="pw")(out)
        else:
            out = WNConv(self.features, k, use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, name="conv")(img)

        out = mask4(out)
        hidden = make_activation(self.act)(out)
        out = nn.Dropout(rate=self.dropout, deterministic=deterministic)(hidden)
        # back to a single plane (reference conv_out, preencoder.py:268)
        out = WNConv(1, (1, 1), use_weight_norm=False, dtype=self.dtype,
                     name="conv_out")(out)
        out = out[..., 0]  # (B, T, C)

        if return_hidden:
            return out, hidden
        return out
