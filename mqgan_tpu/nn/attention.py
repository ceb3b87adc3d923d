"""CBAM-style channel & spatial gating for 1-D sequences, (B, T, C) layout.

Behavioral spec: reference attentions.py:195-419. These are *gates*, not
sequence attention — no O(T^2) interactions anywhere; receptive field comes
from convs. Both global (masked pool) and causal (prefix pool) variants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.core.masking import apply_mask
from mqgan_tpu.nn.conv import WNConv
from mqgan_tpu.nn.pooling import (
    causal_masked_avg_pool,
    causal_masked_max_pool,
    masked_avg_pool,
    masked_max_pool,
)


class CAM1D(nn.Module):
    """Channel attention (reference attentions.py:195-273): masked max+avg
    pooling -> shared 2-layer MLP -> sigmoid channel gate. Causal variant
    gates per (t, channel) from prefix pools."""

    channels: int
    reduction_ratio: int = 8
    causal: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        pad_mask: jax.Array,
        stats_mask: jax.Array | None = None,
        seq_axis: str | None = None,
    ) -> jax.Array:
        """``stats_mask``/``seq_axis`` make the GLOBAL gate exact under
        sequence parallelism (parallel/seqpar.py): values are still masked
        by ``pad_mask`` (halo frames keep real activations), but the
        pooled statistics exclude ``stats_mask`` positions (each clip
        frame counted on exactly one device) and are psum/pmax-reduced
        over the ``seq_axis`` mesh axis — so the gate equals a
        single full-length pass. Both default to the plain behavior."""
        hidden = self.channels // self.reduction_ratio
        dense1 = nn.Dense(hidden, dtype=self.dtype, name="mlp_0")
        dense2 = nn.Dense(self.channels, dtype=self.dtype, name="mlp_2")

        def mlp(v):
            return dense2(nn.relu(dense1(v)))

        if self.causal:
            if stats_mask is not None or seq_axis is not None:
                raise NotImplementedError(
                    "causal CAM has no sequence-parallel variant (the "
                    "encode trunk's CBAM is non-causal; causal blocks "
                    "drop CBAM entirely)")
            mx = causal_masked_max_pool(x, pad_mask)  # (B, T, C)
            av = causal_masked_avg_pool(x, pad_mask)
            gate = nn.sigmoid(mlp(mx) + mlp(av))  # (B, T, C)
        else:
            pool_mask = pad_mask if stats_mask is None else stats_mask
            mx = masked_max_pool(x, pool_mask, seq_axis)  # (B, C)
            av = masked_avg_pool(x, pool_mask, seq_axis)
            gate = nn.sigmoid(mlp(mx) + mlp(av))[:, None, :]  # (B, 1, C)

        return apply_mask(gate * x, pad_mask)


class SAM1D(nn.Module):
    """Spatial (time) attention (reference attentions.py:275-365):
    channel-wise max+avg -> conv1d(k) over time -> sigmoid time gate. Causal
    variant left-pads the conv; pad logits forced to -1e4."""

    kernel_size: int = 7
    use_bias: bool = False
    causal: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array) -> jax.Array:
        mx = jnp.max(x, axis=-1, keepdims=True)  # (B, T, 1)
        av = jnp.mean(x, axis=-1, keepdims=True)
        mx = apply_mask(mx, pad_mask)
        av = apply_mask(av, pad_mask)
        feats = jnp.concatenate([mx, av], axis=-1)  # (B, T, 2)

        conv = WNConv(
            features=1,
            kernel_size=(self.kernel_size,),
            padding="CAUSAL" if self.causal else "SAME_TORCH",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )
        logits = conv(feats)  # (B, T, 1)
        logits = apply_mask(logits, pad_mask, fill_value=-1e4)
        gate = nn.sigmoid(logits)
        gate = apply_mask(gate, pad_mask)
        return apply_mask(gate * x, pad_mask)


class CBAM1D(nn.Module):
    """CAM -> SAM -> residual add, re-masked (reference attentions.py:367-419)."""

    channels: int
    reduction_ratio: int = 8
    causal: bool = False
    sam_kernel_size: int = 7
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        pad_mask: jax.Array,
        stats_mask: jax.Array | None = None,
        seq_axis: str | None = None,
    ) -> jax.Array:
        y = CAM1D(
            channels=self.channels,
            reduction_ratio=self.reduction_ratio,
            causal=self.causal,
            dtype=self.dtype,
            name="channel_attention",
        )(x, pad_mask, stats_mask, seq_axis)
        y = SAM1D(
            kernel_size=self.sam_kernel_size,
            use_bias=False,
            causal=self.causal,
            dtype=self.dtype,
            name="spatial_attention",
        )(y, pad_mask)
        return apply_mask(y + x, pad_mask)
