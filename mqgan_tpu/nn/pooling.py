"""Mask-aware global and causal pooling over time for (B, T, C) arrays.

Behavioral spec: reference attentions.py:81-193. Causal variants are prefix
max (cummax) / prefix mean (cumsum / cumcount) — both XLA-native associative
scans, which is exactly why this design maps well to TPU.

pad_mask is (B, T) bool, True = padded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_max_pool(
    x: jax.Array, pad_mask: jax.Array, axis_name: str | None = None,
) -> jax.Array:
    """(B, T, C), (B, T) -> (B, C): max over valid time steps.

    ``axis_name``: inside shard_map with the time axis sharded over a mesh
    axis, also pmax over it — the result is the max over the GLOBAL valid
    frames, provided each frame is valid on exactly one device (sequence
    parallelism, parallel/seqpar.py)."""
    filled = jnp.where(pad_mask[..., None], jnp.asarray(_NEG_INF, x.dtype), x)
    local = jnp.max(filled, axis=1)
    if axis_name is not None:
        local = jax.lax.pmax(local, axis_name)
    return local


def masked_avg_pool(
    x: jax.Array, pad_mask: jax.Array, axis_name: str | None = None,
) -> jax.Array:
    """(B, T, C), (B, T) -> (B, C): mean over valid time steps (count
    clamped to >= 1, reference attentions.py:129).

    ``axis_name``: psum the (sum, count) pair over the mesh axis before
    dividing — the GLOBAL mean when each frame is valid on exactly one
    device (the count is clamped only after the reduction, matching a
    single full-length pass bit-for-bit in the all-padded case)."""
    valid = (~pad_mask).astype(x.dtype)[..., None]
    total = jnp.sum(x * valid, axis=1)
    count = jnp.sum(valid, axis=1)
    if axis_name is not None:
        total, count = jax.lax.psum((total, count), axis_name)
    return total / jnp.maximum(count, 1.0)


def causal_masked_max_pool(x: jax.Array, pad_mask: jax.Array) -> jax.Array:
    """(B, T, C) -> (B, T, C): running max over valid prefix (reference
    attentions.py:134-153 — padded steps contribute -inf, output at fully
    padded prefixes stays -inf as in the reference cummax)."""
    filled = jnp.where(pad_mask[..., None], jnp.asarray(_NEG_INF, x.dtype), x)
    return jax.lax.cummax(filled, axis=1)


def causal_masked_avg_pool(x: jax.Array, pad_mask: jax.Array) -> jax.Array:
    """(B, T, C) -> (B, T, C): running mean over valid prefix; zero where no
    valid prefix exists (reference attentions.py:155-193)."""
    valid = (~pad_mask).astype(x.dtype)[..., None]
    num = jnp.cumsum(x * valid, axis=1)
    cnt = jnp.cumsum(valid, axis=1)
    avg = num / jnp.maximum(cnt, 1.0)
    return jnp.where(cnt == 0, jnp.zeros_like(avg), avg)
