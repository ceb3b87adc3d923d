"""Polynomial fast path for the deterministic MelMixer2D pointwise MLP.

The mixer's expand -> APTx -> contract stage (reference ConvBlock2D,
preencoder.py:252-268,295-296) maps EACH SCALAR of the depthwise-conv
output independently: with pw weights w1 (features,), bias b1, conv_out
weights w2 (features,), bias b2,

    out[b,t,c] = g(z[b,t,c]),   g(z) = sum_f w2[f] * aptx(w1[f] z + b1[f]) + b2

because the pointwise expansion reads a single input plane.  The exact
path therefore spends `features` transcendental evaluations per element
(4.29G APTx evals per flagship mixer call, measured VPU-bound at the
751 Gelem/s APTx rate — benchmarks/README.md "Mixer VPU roofline").

This module evaluates g once on a Chebyshev grid spanning the batch's
observed input range (a few thousand points, in-graph, per call) and
replaces the per-element MLP with a degree-N Chebyshev interpolant via
Clenshaw recurrence: ~N fused multiply-adds per element, zero
transcendentals, no gather.  g is analytic (a finite sum of tanh), so the
interpolation error decays geometrically in N; the fit range is the exact
per-batch [min, max], so there is no out-of-range extrapolation.

Approximation quality is measured, not assumed: tests/test_mixer_poly.py
checks the scalar fit and the module-level deviation, and the serving docs
record the end-to-end recon deviation on the flagship config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mqgan_tpu.nn.activations import aptx


def mixer_scalar_g(z: jax.Array, w1, b1, w2, b2) -> jax.Array:
    """The exact scalar map of the mixer MLP, vectorized over z (f32)."""
    u = z[..., None] * w1 + b1
    return jnp.sum(w2 * aptx(u), axis=-1) + b2


def _chebyshev_fit(g_nodes: jax.Array, degree: int) -> jax.Array:
    """Degree-N Chebyshev coefficients from values at `grid` first-kind
    Chebyshev nodes (discrete cosine projection — exact for polynomials up
    to the grid size, numerically stable, no linear solve)."""
    grid = g_nodes.shape[0]
    j = jnp.arange(grid, dtype=jnp.float32)
    theta = (j + 0.5) * (jnp.pi / grid)
    k = jnp.arange(degree + 1, dtype=jnp.float32)
    # C[k, j] = cos(k * theta_j); coeffs c_k = (2/grid) sum_j g_j C[k, j]
    basis = jnp.cos(k[:, None] * theta[None, :])
    coef = (2.0 / grid) * (basis @ g_nodes)
    return coef.at[0].mul(0.5)


def _clenshaw(t: jax.Array, coef: jax.Array) -> jax.Array:
    """Evaluate sum_k c_k T_k(t) for t in [-1, 1], f32, unrolled (degree is
    static and small; an unrolled chain lets XLA fuse the whole recurrence
    into one elementwise pass over t)."""
    two_t = 2.0 * t
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    n = coef.shape[0]
    for kk in range(n - 1, 0, -1):
        b1, b2 = two_t * b1 - b2 + coef[kk], b1
    return t * b1 - b2 + coef[0]


@functools.partial(jax.jit, static_argnames=("degree", "grid"))
def poly_mixer_apply(
    z: jax.Array,           # (B, T, C) depthwise-conv output (masked)
    pad_mask: jax.Array | None,  # (B, T) True = padded, or None
    w1: jax.Array,          # (features,) folded pw kernel
    b1: jax.Array,          # (features,)
    w2: jax.Array,          # (features,) conv_out kernel
    b2: jax.Array,          # scalar conv_out bias
    *,
    degree: int = 160,
    grid: int = 4096,
) -> jax.Array:
    """out = g(z) via per-batch-range Chebyshev interpolation of g.

    Padded positions return exactly b2 — the exact path zeroes the hidden
    after the expansion, so pads see conv_out(aptx-of-nothing) = b2.
    """
    zf = z.astype(jnp.float32)
    w1f = w1.astype(jnp.float32)
    b1f = b1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    b2f = jnp.asarray(b2, jnp.float32)

    zmin = jax.lax.stop_gradient(jnp.min(zf))
    zmax = jax.lax.stop_gradient(jnp.max(zf))
    half = jnp.maximum(0.5 * (zmax - zmin), 1e-6)
    mid = 0.5 * (zmax + zmin)

    j = jnp.arange(grid, dtype=jnp.float32)
    nodes_t = jnp.cos((j + 0.5) * (jnp.pi / grid))
    nodes_z = mid + half * nodes_t
    g_nodes = mixer_scalar_g(nodes_z, w1f, b1f, w2f, b2f)
    coef = _chebyshev_fit(g_nodes, degree)

    t = (zf - mid) / half
    out = _clenshaw(t, coef)
    if pad_mask is not None:
        out = jnp.where(pad_mask[:, :, None], b2f, out)
    return out.astype(z.dtype)
