"""Pallas TPU kernel: fused MelMixer2D (the generator's mel-mixer).

The mixer (reference ConvBlock2D, preencoder.py:205-301) treats the (T, C)
feature plane as a 1-channel image: depthwise 5x5 conv -> mask -> pointwise
expansion to P=features planes -> mask -> APTx -> 1x1 contraction back to one
plane.  The expansion materializes a (B, T, C, P) hidden — ~8.6 G elements at
the flagship B=64 T=512 C=P=512 — which XLA streams through HBM: measured
19.7 ms per mixer on the TPU (benchmarks/README.md), ~2x the VPU floor.

Per grid step this kernel holds one (T, C) slab in VMEM and:

  * computes the 5x5 depthwise conv as 25 shifted adds (VPU; the conv has
    one plane, so the MXU has nothing to chew on),
  * applies the row mask from per-row lengths,
  * evaluates the pointwise chain  out = sum_p w2_p * aptx(w1_p*s + b1_p) + b2
    as a fori_loop over the P hidden planes, slab-at-a-time on the VPU —
    the (T, C, P) hidden never exists, not even in VMEM.

APTx here is the non-trainable variant (alpha=1, beta=1, gamma=0.5;
reference attentions.py:9-35), so aptx(z) = 0.5 * (z + z*tanh(z)); the
linear half `0.5*sum_p w2_p z_p` is folded into precomputed scalars A, B
(z_p = w1_p*s + b1_p), leaving only the z*tanh(z) half in the loop.

HBM traffic: read x once, write out once.  The XLA path in nn/mixer2d.py
stays the default and the parity reference; fused is opt-in
(MelMixer2D(fused=True)), inference-only, lane-aligned C.  Parity tested in
interpret mode (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(dw_k: int, len_ref, dwk_ref, consts_ref, w1_ref, b1_ref, w2_ref,
            x_ref, out_ref):
    t, c = x_ref.shape[1], x_ref.shape[2]
    x = x_ref[0].astype(jnp.float32)  # (T, C)
    length = len_ref[pl.program_id(0), 0]
    pad = dw_k // 2

    # --- depthwise 5x5 conv as shifted adds on the zero-padded plane
    # (concat, not dynamic_update_slice — Mosaic has no lowering for dus)
    xp = jnp.concatenate(
        [jnp.zeros((pad, c), jnp.float32), x,
         jnp.zeros((pad, c), jnp.float32)], axis=0)
    xp = jnp.concatenate(
        [jnp.zeros((t + 2 * pad, pad), jnp.float32), xp,
         jnp.zeros((t + 2 * pad, pad), jnp.float32)], axis=1)
    s = jnp.zeros((t, c), jnp.float32)
    for dy in range(dw_k):
        for dx in range(dw_k):
            s = s + dwk_ref[dy, dx] * xp[dy:dy + t, dx:dx + c]
    s = s + consts_ref[0, 0]  # depthwise bias

    # --- row mask (True = padded) from contiguous lengths
    valid = (jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
             < length).astype(jnp.float32)
    s = s * valid

    # --- pointwise expansion -> APTx -> contraction, one plane at a time.
    # aptx(z) = 0.5*z + 0.5*z*tanh(z); with z_p = w1_p*s + b1_p the linear
    # half contracts to A*s + B with A = 0.5*sum w2_p*w1_p,
    # B = 0.5*sum w2_p*b1_p (precomputed in consts).
    a_lin = consts_ref[0, 2]
    b_lin = consts_ref[0, 3]
    p_total = w1_ref.shape[1]

    def body(p, acc):
        z = w1_ref[0, p] * s + b1_ref[0, p]
        return acc + w2_ref[0, p] * (z * jnp.tanh(z))

    acc = jax.lax.fori_loop(0, p_total, body, jnp.zeros((t, c), jnp.float32))
    # the XLA path masks again after pw, so padded rows contribute aptx(0)=0
    # to the contraction and the output there is exactly the conv_out bias
    out = (a_lin * s + b_lin + 0.5 * acc) * valid + consts_ref[0, 1]
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dw_k", "interpret"))
def _fused_mixer(x, lengths, dwk, consts, w1, b1, w2, *, dw_k, interpret):
    b, t, c = x.shape
    t_pad = _round_up(t, 8)
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    p_total = w1.shape[1]

    kernel = functools.partial(_kernel, dw_k)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec((dw_k, dw_k), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, p_total), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, p_total), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, p_total), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        # the 25 shifted fp32 views of the padded plane overshoot the 16 MB
        # default scoped budget at T=512 C=512; the core has headroom
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(lengths.reshape(b, 1).astype(jnp.int32), dwk, consts, w1, b1, w2, x)
    return out[:, :t, :]


def _fold_wn(p: dict) -> jax.Array:
    if "kernel" in p:
        return jnp.asarray(p["kernel"], jnp.float32)
    v = jnp.asarray(p["v"], jnp.float32)
    g = jnp.asarray(p["g"], jnp.float32)
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes))
    return v * (g / jnp.maximum(norm, 1e-12))


def fused_mel_mixer(
    x: jax.Array,
    lengths: jax.Array,
    mixer_params: dict,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Run one MelMixer2D (depthwise variant, fixed aptx) as a fused kernel.

    x: (B, T, C) in the model compute dtype; lengths: (B,) valid frame
    counts (contiguous masks only); mixer_params: the mixer's flax param
    subtree (dw / pw / conv_out).  Matches nn/mixer2d.py for deterministic
    calls; padded rows come out as the conv_out bias, exactly like the XLA
    path.
    """
    b, t, c = x.shape
    if c % LANES != 0:
        raise ValueError(f"fused mixer requires C % {LANES} == 0, got {c}")
    if interpret is None:  # Mosaic needs a TPU ("tpu"/tunneled "axon")
        interpret = jax.default_backend() == "cpu"

    dwk = _fold_wn(mixer_params["dw"]).reshape(-1)  # (k*k,)
    dw_k = int(round(len(dwk) ** 0.5))
    dwk = dwk.reshape(dw_k, dw_k)
    dw_bias = jnp.asarray(mixer_params["dw"]["bias"], jnp.float32).reshape(())

    w1 = _fold_wn(mixer_params["pw"]).reshape(-1)  # (P,)
    b1 = jnp.asarray(mixer_params["pw"]["bias"], jnp.float32)
    w2 = jnp.asarray(mixer_params["conv_out"]["kernel"],
                     jnp.float32).reshape(-1)
    out_bias = jnp.asarray(mixer_params["conv_out"]["bias"],
                           jnp.float32).reshape(())

    a_lin = 0.5 * jnp.sum(w2 * w1)
    b_lin = 0.5 * jnp.sum(w2 * b1)
    consts = jnp.stack([dw_bias, out_bias, a_lin, b_lin]).reshape(1, 4)

    p_total = w1.shape[0]
    return _fused_mixer(
        x, lengths, dwk, consts, w1.reshape(1, p_total),
        b1.reshape(1, p_total), w2.reshape(1, p_total),
        dw_k=dw_k, interpret=interpret)
