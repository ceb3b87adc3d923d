"""Convolutions for channels-last layouts with optional weight normalization.

Design notes (TPU-first):
* Layout is (B, T, C) for 1-D and (B, H, W, C) for 2-D — channels stay in
  the XLA lane dimension, so convs lower to MXU matmuls without transposes
  (the reference permutes between (B,T,C) and (B,C,T) constantly; we never
  do).
* Weight norm (torch nn.utils.weight_norm semantics, used at reference
  attentions.py:468-469, preencoder.py:51-53) is a *param transform*:
  params are `v` (direction) and `g` (per-output-channel magnitude); the
  effective kernel g * v / ||v|| is recomputed each step. `fold()` collapses
  it for inference (reference strip_weight_norm, preencoder.py:507-514).
* Causal conv pads dilation*(k-1) zeros on the left only (reference
  CausalConv1da, attentions.py:422-474).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _l2_over_all_but_last(v: jax.Array, eps: float = 0.0) -> jax.Array:
    """Per-output-channel L2 norm: reduce all axes except the last (O)."""
    axes = tuple(range(v.ndim - 1))
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes))


def weight_norm_kernel(v: jax.Array, g: jax.Array, dtype=None) -> jax.Array:
    """kernel = g * v / ||v||, norm per output channel (torch dim=0 equiv:
    torch weight (O, I, K) normalizes over (I, K) per O; our layout
    (K, I, O) normalizes over (K, I) per O — same quantity)."""
    norm = _l2_over_all_but_last(v)
    kernel = v * (g / jnp.maximum(norm, 1e-12))
    if dtype is not None:
        kernel = kernel.astype(dtype)
    return kernel


class WNConv(nn.Module):
    """N-D convolution (channels-last) with optional weight norm.

    kernel_size: tuple of spatial dims. padding: 'CAUSAL' (1-D only),
    'SAME_TORCH' (symmetric dilation*(k//2), torch 'same' for odd k), an
    explicit per-dim (lo, hi) sequence, or 'VALID'.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...] | None = None
    dilation: Tuple[int, ...] | None = None
    padding: str | Sequence[Tuple[int, int]] = "SAME_TORCH"
    use_bias: bool = True
    use_weight_norm: bool = False
    feature_group_count: int = 1
    dtype: jnp.dtype | None = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ndim = len(self.kernel_size)
        strides = self.strides or (1,) * ndim
        dilation = self.dilation or (1,) * ndim
        in_features = x.shape[-1]
        kshape = self.kernel_size + (
            in_features // self.feature_group_count,
            self.features,
        )

        if self.use_weight_norm:
            v = self.param("v", self.kernel_init, kshape, jnp.float32)
            # g initialized to ||v|| so the initial effective kernel == v,
            # matching torch weight_norm registration semantics.
            g = self.param("g", lambda key: _l2_over_all_but_last(v))
            kernel = weight_norm_kernel(v, g, self.dtype or x.dtype)
        else:
            kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
            kernel = kernel.astype(self.dtype or x.dtype)

        if isinstance(self.padding, str):
            if self.padding == "CAUSAL":
                assert ndim == 1, "CAUSAL padding is 1-D only"
                pad = [(dilation[0] * (self.kernel_size[0] - 1), 0)]
            elif self.padding == "SAME_TORCH":
                pad = [
                    (d * (k // 2), d * (k // 2))
                    for k, d in zip(self.kernel_size, dilation)
                ]
            elif self.padding == "VALID":
                pad = [(0, 0)] * ndim
            else:
                raise ValueError(f"unknown padding {self.padding}")
        else:
            pad = [tuple(p) for p in self.padding]

        dn = lax_conv_dims(ndim)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            kernel,
            window_strides=strides,
            padding=pad,
            rhs_dilation=dilation,
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


def lax_conv_dims(ndim: int):
    if ndim == 1:
        return ("NHC", "HIO", "NHC")
    if ndim == 2:
        return ("NHWC", "HWIO", "NHWC")
    raise ValueError(ndim)


class Conv1d(WNConv):
    """Convenience 1-D wrapper; kernel_size given as int via factory."""


def conv1d(
    features: int,
    kernel_size: int,
    *,
    dilation: int = 1,
    causal: bool = False,
    use_weight_norm: bool = False,
    use_bias: bool = True,
    dtype=None,
    name: str | None = None,
) -> WNConv:
    return WNConv(
        features=features,
        kernel_size=(kernel_size,),
        dilation=(dilation,),
        padding="CAUSAL" if causal else "SAME_TORCH",
        use_bias=use_bias,
        use_weight_norm=use_weight_norm,
        dtype=dtype,
        name=name,
    )


def fold_weight_norm(params: dict) -> dict:
    """Recursively replace {v, g} pairs with the folded kernel.

    Equivalent of reference strip_weight_norm (preencoder.py:507-514) for
    export: the folded tree is a drop-in for inference-only modules created
    with use_weight_norm=False.
    """

    def fold(tree):
        if isinstance(tree, dict):
            if "v" in tree and "g" in tree:
                out = {k: v for k, v in tree.items() if k not in ("v", "g")}
                out["kernel"] = weight_norm_kernel(tree["v"], tree["g"])
                return out
            return {k: fold(v) for k, v in tree.items()}
        return tree

    return fold(params)
