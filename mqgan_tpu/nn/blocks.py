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
    """fused=True runs the whole block (convs as shifted MXU matmuls + CBAM
    gate chain + tail) as one Pallas kernel (ops/block_kernels.py) with the
    (T, C) slab resident in VMEM.  Inference-only (deterministic),
    "weight"-norm blocks with taptx act, dilation 1, and lane-aligned
    channels; assumes contiguous pad masks (the framework convention).  The
    param tree is identical either way, so the flag can be flipped on a
    trained checkpoint; other configurations silently fall back to the XLA
    path, which remains the default and the parity reference."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    dropout: float = 0.3
    act: str = "relu"
    causal: bool = False
    norm: str = "layer"  # "weight" | "layer" | "instance"
    fused: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        pad_mask: jax.Array | None = None,
        deterministic: bool = True,
        stats_mask: jax.Array | None = None,
        seq_axis: str | None = None,
    ) -> jax.Array:
        """``stats_mask``/``seq_axis`` (sequence parallelism): forwarded to
        the CBAM channel gate so its global pooled statistics are computed
        over each device's interior frames and reduced over the mesh axis
        (exact vs a full-length pass; parallel/seqpar.py). Defaults keep
        the plain single-device behavior."""
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

        has_proj = self.in_channels != self.out_channels
        proj = (
            conv1d(self.out_channels, 1, use_weight_norm=False,
                   dtype=self.dtype, name="residual")
            if has_proj else None
        )
        cbam = (
            CBAM1D(channels=self.out_channels, causal=False, dtype=self.dtype,
                   name="cbam")
            if not self.causal else None
        )
        mask = (pad_mask if pad_mask is not None
                else jnp.zeros(x.shape[:2], bool))

        use_fused = (
            self.fused and deterministic and self.norm == "weight"
            and self.act == "taptx" and self.dilation == 1
            and self.in_channels % 128 == 0 and self.out_channels % 128 == 0
            # the Pallas kernel's CBAM pools over its own slab only — fall
            # back to the XLA path under sequence parallelism
            and stats_mask is None and seq_axis is None
        )
        if use_fused:
            from mqgan_tpu.ops.block_kernels import fused_residual_block

            # Tiny dummy calls declare every submodule's params (identical
            # tree to the XLA path); their outputs are unused and DCE'd
            # under jit.  The kernel then consumes the raw param values.
            da = conv_a(x[:1, :8])
            _ = conv_b(da)
            _ = act(da)
            params = {"conv1": conv_a.variables["params"],
                      "conv2": conv_b.variables["params"]}
            if proj is not None:
                _ = proj(x[:1, :8])
                params["residual"] = proj.variables["params"]
            if cbam is not None:
                _ = cbam(da, mask[:1, :8])
                params["cbam"] = cbam.variables["params"]
            lengths = jnp.sum(~mask, axis=1).astype(jnp.int32)
            out = fused_residual_block(
                x.astype(self.dtype or x.dtype), lengths, params,
                kernel_size=self.kernel_size, causal=self.causal,
                act_beta=act.variables["params"]["beta"],
                act_gamma=act.variables["params"]["gamma"],
            )
            # XLA path's result dtype: only the IDENTITY residual add
            # promotes with the input dtype (e.g. fp32 x through a bf16
            # block); with a residual projection the add is conv-output +
            # conv-output, both in the compute dtype
            if has_proj:
                return out.astype(self.dtype or x.dtype)
            return out.astype(jnp.promote_types(x.dtype,
                                                self.dtype or x.dtype))

        residual = proj(x) if proj is not None else x

        out = conv_a(x)
        out = make_norm("norm1")(out)
        out = apply_mask(out, pad_mask)
        out = act(out)

        out = conv_b(out)
        out = make_norm("norm2")(out)
        if cbam is not None:
            out = cbam(out, mask, stats_mask, seq_axis)
        out = out + residual
        out = apply_mask(out, pad_mask)
        out = act(out)
        out = nn.Dropout(rate=self.dropout, deterministic=deterministic)(out)
        return out
