"""Sequence-mask utilities.

Convention (kept from the reference, preencoder.py:15-24): a *pad mask* is a
boolean array where **True = padded / invalid** and False = valid. All blocks
in this framework take `pad_mask` of shape (B, T) (time-major) and broadcast
it over channel dims as needed; layouts here are channels-last (B, T, C),
which keeps the channel axis in the TPU lane dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(max_length: int, lengths: jax.Array) -> jax.Array:
    """(B,) lengths -> (B, max_length) bool, True where index >= length (pad)."""
    positions = jnp.arange(max_length, dtype=lengths.dtype)[None, :]
    return positions >= lengths[:, None]


def apply_mask(x: jax.Array, pad_mask: jax.Array | None, fill_value=0.0) -> jax.Array:
    """Zero (or fill) padded positions of x.

    x: (B, T, ...) channels-last; pad_mask: (B, T) bool True=pad.
    """
    if pad_mask is None:
        return x
    shape = pad_mask.shape + (1,) * (x.ndim - pad_mask.ndim)
    return jnp.where(pad_mask.reshape(shape), jnp.asarray(fill_value, x.dtype), x)


def valid_f32(pad_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, T) pad mask -> float array, 1.0 where valid, 0.0 where padded."""
    return (~pad_mask).astype(dtype)


def downsample_mask_any(pad_mask: jax.Array, stride: int) -> jax.Array:
    """Max-pool a (B, T) pad mask in time with kernel=stride, ceil-mode.

    Matches torch `F.max_pool2d(..., ceil_mode=True)` used by the reference
    discriminators (discriminators.py:222-229): an output position is padded
    (True) only if *all* covered input positions are padded.

    Reference semantics are max over the window of the 0/1 mask, i.e. the
    output is True (padded) if ANY covered position is padded. We keep that
    exactly: max-pool of the boolean.
    """
    if stride == 1:
        return pad_mask
    b, t = pad_mask.shape
    t_out = -(-t // stride)  # ceil
    pad_amt = t_out * stride - t
    # ceil_mode pads with -inf in torch's max_pool; for a bool "is-pad" mask
    # padding with False would wrongly mark tail windows valid. torch pads
    # with -inf -> contributes 0 (False) to max. Mirror that.
    m = jnp.pad(pad_mask, ((0, 0), (0, pad_amt)), constant_values=False)
    return m.reshape(b, t_out, stride).max(axis=-1)


def lengths_from_mask(pad_mask: jax.Array) -> jax.Array:
    """(B, T) pad mask -> (B,) int32 valid lengths."""
    return jnp.sum(valid_f32(pad_mask), axis=-1).astype(jnp.int32)
