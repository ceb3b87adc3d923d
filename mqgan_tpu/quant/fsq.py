"""Finite Scalar Quantization (FSQ).

Behavioral spec: reference quantizer.py:50-272 — per-dimension tanh bounding,
round with straight-through gradients, normalization by half-width, implicit
codebook via mixed-radix index packing (basis = cumprod([1, *levels[:-1]])),
optional symmetry-preserving bound, optional training-time noise dropout
(per-sample skip-quantize or uniform offset), quantization forced to fp32
under mixed precision (quantizer.py:233-253).

TPU-first design: everything is a pure function of (z, rng); no implicit
module state. The rounding core is 4-wide elementwise math — XLA fuses it
into the surrounding projections; ops/fsq_kernels.py provides a Pallas
fused bound+round+pack kernel for the encode hot path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def round_ste(z: jax.Array) -> jax.Array:
    """Round with straight-through gradients (reference quantizer.py:39-42)."""
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


def floor_ste(z: jax.Array) -> jax.Array:
    return z + jax.lax.stop_gradient(jnp.floor(z) - z)


@dataclasses.dataclass(frozen=True)
class FSQSpec:
    """Static description of an FSQ quantizer."""

    levels: Tuple[int, ...]
    preserve_symmetry: bool = False
    noise_dropout: float = 0.0

    @property
    def codebook_dim(self) -> int:
        return len(self.levels)

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))

    @property
    def basis(self) -> np.ndarray:
        return np.cumprod([1] + list(self.levels[:-1])).astype(np.int32)

    @property
    def half_width(self) -> np.ndarray:
        return (np.asarray(self.levels, np.int32) // 2).astype(np.float32)


def bound(z: jax.Array, levels: Sequence[int], eps: float = 1e-3) -> jax.Array:
    """Per-dim bounded squash (reference quantizer.py:109-114)."""
    lv = jnp.asarray(levels, jnp.float32)
    half_l = (lv - 1.0) * (1.0 + eps) / 2.0
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def symmetry_preserving_bound(z: jax.Array, levels: Sequence[int]) -> jax.Array:
    """QL(x) = 2/(L-1) * floor_ste[(L-1)(tanh(x)+1)/2 + 0.5] - 1
    (reference quantizer.py:118-126)."""
    lv = jnp.asarray(levels, jnp.float32)
    lm1 = lv - 1.0
    bracket = floor_ste(lm1 * (jnp.tanh(z) + 1.0) / 2.0 + 0.5)
    return (2.0 / lm1) * bracket - 1.0


def quantize(
    z: jax.Array,
    spec: FSQSpec,
    *,
    training: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """z (..., d) fp32 -> quantized zhat in [-1, 1]^d, same shape, with STE
    gradients (reference quantizer.py:128-162).

    Training-time noise dropout (rate spec.noise_dropout, per *sample* along
    the leading axis): with prob p the sample skips quantization entirely;
    independently with prob p it gets `unquantized + uniform(-.5,.5)/half`.
    """
    half = jnp.asarray(spec.half_width)
    if spec.preserve_symmetry:
        q = round_ste(symmetry_preserving_bound(z, spec.levels)) / half
    else:
        q = round_ste(bound(z, spec.levels)) / half

    if not training or spec.noise_dropout == 0.0:
        return q
    assert rng is not None, "training-time FSQ noise needs an rng"

    batch = z.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    bshape = (batch,) + (1,) * (z.ndim - 1)
    skip = jax.random.bernoulli(k1, spec.noise_dropout, (batch,)).reshape(bshape)
    q = jnp.where(skip, z, q)
    offs = jax.random.bernoulli(k2, spec.noise_dropout, (batch,)).reshape(bshape)
    offset = (jax.random.uniform(k3, z.shape, z.dtype) - 0.5) / half
    return jnp.where(offs, z + offset, q)


def codes_to_indices(zhat: jax.Array, spec: FSQSpec) -> jax.Array:
    """Normalized codes (..., d) -> packed int32 indices (...,)
    (reference quantizer.py:177-181)."""
    half = jnp.asarray(spec.half_width)
    shifted = zhat * half + half  # in [0, L-1]
    return jnp.sum(shifted * jnp.asarray(spec.basis, jnp.float32), axis=-1).astype(
        jnp.int32
    )


def indices_to_level_indices(indices: jax.Array, spec: FSQSpec) -> jax.Array:
    """(...,) int -> (..., d) per-level indices (reference quantizer.py:183-187)."""
    basis = jnp.asarray(spec.basis, indices.dtype)
    lv = jnp.asarray(spec.levels, indices.dtype)
    return (indices[..., None] // basis) % lv


def indices_to_codes(indices: jax.Array, spec: FSQSpec) -> jax.Array:
    """(...,) int -> (..., d) normalized codes in [-1, 1]
    (reference quantizer.py:189-205, _indices_to_codes + scale_shift_inverse)."""
    half = jnp.asarray(spec.half_width)
    level_idx = indices_to_level_indices(indices, spec).astype(jnp.float32)
    return (level_idx - half) / half


def implicit_codebook(spec: FSQSpec) -> np.ndarray:
    """(codebook_size, d) fp32 table — reference quantizer.py:102-104."""
    idx = np.arange(spec.codebook_size)
    basis = spec.basis
    lv = np.asarray(spec.levels)
    level_idx = (idx[:, None] // basis[None, :]) % lv[None, :]
    half = spec.half_width
    return ((level_idx - half) / half).astype(np.float32)


class FSQ(nn.Module):
    """Full-featured FSQ module (reference quantizer.py:50-272).

    The PreEncoder uses the projectionless single-codebook form
    (preencoder.py:334-336); for standalone use this module also supports:
    * `dim` != effective codebook dim -> learned project_in / project_out
      (quantizer.py:94-96);
    * `num_codebooks` > 1: the feature dim splits into per-codebook groups,
      each packed independently; indices gain a trailing codebook axis when
      `keep_num_codebooks_dim` (quantizer.py:86-88, 229, 267-268);
    * `channel_first` inputs (B, d, ...) (quantizer.py:92, 217-223).

    Forward returns (codes, indices) like reference FSQ.forward
    (quantizer.py:207-272). Quantization math runs in fp32 regardless of the
    compute dtype (force_quantization_f32), and codes are cast back.
    """

    levels: Tuple[int, ...]
    dim: int | None = None
    num_codebooks: int = 1
    keep_num_codebooks_dim: bool | None = None
    channel_first: bool = False
    projection_has_bias: bool = True
    preserve_symmetry: bool = False
    noise_dropout: float = 0.0

    @property
    def spec(self) -> FSQSpec:
        return FSQSpec(
            levels=tuple(self.levels),
            preserve_symmetry=self.preserve_symmetry,
            noise_dropout=self.noise_dropout,
        )

    @property
    def codebook_dim(self) -> int:
        return len(self.levels)

    @property
    def effective_codebook_dim(self) -> int:
        return self.codebook_dim * self.num_codebooks

    @property
    def codebook_size(self) -> int:
        return self.spec.codebook_size

    @property
    def has_projections(self) -> bool:
        dim = self.dim if self.dim is not None else self.effective_codebook_dim
        return dim != self.effective_codebook_dim

    @nn.compact
    def __call__(self, z: jax.Array, training: bool = False):
        spec = self.spec
        keep_cb_dim = (
            self.keep_num_codebooks_dim
            if self.keep_num_codebooks_dim is not None
            else self.num_codebooks > 1
        )
        assert not (self.num_codebooks > 1 and not keep_cb_dim)

        moved = False
        if self.channel_first or z.ndim >= 4:
            # (B, d, ...) -> (B, ..., d), flatten spatial dims
            z = jnp.moveaxis(z, 1, -1)
            moved = True
        lead_shape = z.shape[:-1]
        z = z.reshape(z.shape[0], -1, z.shape[-1])

        if self.has_projections:
            z = nn.Dense(self.effective_codebook_dim,
                         use_bias=self.projection_has_bias,
                         name="project_in")(z)

        b, n, _ = z.shape
        z = z.reshape(b, n, self.num_codebooks, self.codebook_dim)

        orig_dtype = z.dtype
        z32 = z.astype(jnp.float32)
        rng = None
        if training and spec.noise_dropout > 0.0:
            rng = self.make_rng("fsq_noise")
        codes = quantize(z32, spec, training=training, rng=rng)
        # Indices always come from the CLEAN grid quantization: with noise
        # dropout active, packing the noisy codes would produce arbitrary
        # out-of-range ints (the reference has this quirk at
        # quantizer.py:242-249, but our indices feed metrics/token dumps).
        if rng is not None:
            clean = quantize(z32, spec, training=False)
        else:
            clean = codes
        indices = codes_to_indices(jax.lax.stop_gradient(clean), spec)
        # (B, N, C_books)

        codes = codes.reshape(b, n, self.effective_codebook_dim).astype(orig_dtype)
        out = codes
        if self.has_projections:
            out = nn.Dense(self.dim, use_bias=self.projection_has_bias,
                           name="project_out")(out)

        out = out.reshape(lead_shape + (out.shape[-1],))
        indices = indices.reshape(lead_shape + (self.num_codebooks,))
        if moved:
            out = jnp.moveaxis(out, -1, 1)
        if not keep_cb_dim:
            indices = indices[..., 0]  # num_codebooks == 1 (asserted above)
        return out, indices

    def indices_to_codes(self, indices: jax.Array) -> jax.Array:
        """Inverse of the packing (projectionless path only; with
        projections use .apply with method=)."""
        return indices_to_codes(indices, self.spec)
