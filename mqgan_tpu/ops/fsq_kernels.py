"""Pallas TPU kernel: fused FSQ encode head.

Fuses the quantizer input projection with bound -> round -> mixed-radix
index packing (the tail of PreEncoder.encode, reference preencoder.py:
447-451 + quantizer.py:128-181):

    z = h @ W + b            (latent (N, C) @ (C, d))
    q = round(bound(z))      per-dim tanh squash + grid round
    idx = sum((q + half) * basis)

The d=4 quantizer dimension is lane-hostile on TPU (lanes are 128-wide), so
the projection is computed into a zero-padded 128-lane block with the
per-dim constants (half_l, offset, shift, basis) broadcast as (1, 128) rows;
the pack is a masked lane reduction. One kernel invocation replaces three
HBM-materialized intermediates (z, bounded, shifted).

Honest benchmarking note (see tests/test_pallas_kernels.py and
benchmarks/): this tail is a tiny fraction of encode (the conv stack
dominates), so the end-to-end win is small; the kernel exists for the
deploy encode path and as the pattern for future fused heads. The XLA path
(quant/fsq.py) remains the default and the parity reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mqgan_tpu.quant.fsq import FSQSpec

TILE_N = 256
LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _consts(spec: FSQSpec, eps: float = 1e-3):
    """(1, LANES) rows: half_l, offset, shift, half_width, basis, valid."""
    d = spec.codebook_dim
    lv = np.asarray(spec.levels, np.float32)
    half_l = (lv - 1.0) * (1.0 + eps) / 2.0
    offset = np.where(lv % 2 == 0, 0.5, 0.0).astype(np.float32)
    shift = np.arctanh(offset / half_l).astype(np.float32)
    half_width = spec.half_width
    basis = spec.basis.astype(np.float32)

    def pad(v, fill=0.0):
        out = np.full((1, LANES), fill, np.float32)
        out[0, :d] = v
        return out

    # half_l=1 beyond d keeps tanh args finite; basis=0 zeroes the pack there
    return np.concatenate(
        [pad(half_l, 1.0), pad(offset), pad(shift), pad(half_width, 1.0),
         pad(basis, 0.0)],
        axis=0,
    )  # (5, LANES)


def _kernel(h_ref, w_ref, b_ref, c_ref, idx_ref):
    z = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    z = z + b_ref[:]
    half_l = c_ref[0:1, :]
    offset = c_ref[1:2, :]
    shift = c_ref[2:3, :]
    half_w = c_ref[3:4, :]
    basis = c_ref[4:5, :]

    bounded = jnp.tanh(z + shift) * half_l - offset
    q = jnp.round(bounded)  # grid points in [-half, half]
    shifted = q + half_w  # [0, L-1]
    idx = jnp.sum(shifted * basis, axis=-1, keepdims=True)
    idx_ref[:] = jnp.broadcast_to(idx, idx_ref.shape).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fsq_encode_pallas(h, w_pad, b_pad, consts, interpret=False):
    n, c = h.shape
    n_pad = _round_up(n, TILE_N)
    if n_pad != n:
        h = jnp.pad(h, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), jnp.int32),
        interpret=interpret,
    )(h.astype(jnp.float32), w_pad, b_pad, consts)
    return out[:n, 0]


class FSQEncodeHead:
    """Callable fused head: (h (..., C)) -> packed indices (...,).

    Built from the q_in_proj Dense params (kernel (C, d), bias (d,)) and the
    FSQ spec; equals q_in_proj -> quantize -> codes_to_indices exactly.
    """

    def __init__(self, kernel: np.ndarray, bias: np.ndarray, spec: FSQSpec,
                 interpret: bool = False):
        c, d = kernel.shape
        assert d == spec.codebook_dim
        w_pad = np.zeros((c, LANES), np.float32)
        w_pad[:, :d] = np.asarray(kernel, np.float32)
        b_pad = np.zeros((1, LANES), np.float32)
        b_pad[0, :d] = np.asarray(bias, np.float32)
        self._w = jnp.asarray(w_pad)
        self._b = jnp.asarray(b_pad)
        self._c = jnp.asarray(_consts(spec))
        self.interpret = interpret

    def __call__(self, h: jax.Array) -> jax.Array:
        lead = h.shape[:-1]
        flat = h.reshape(-1, h.shape[-1])
        idx = _fsq_encode_pallas(flat, self._w, self._b, self._c,
                                 interpret=self.interpret)
        return idx.reshape(lead)
