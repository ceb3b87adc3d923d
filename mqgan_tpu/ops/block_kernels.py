"""Pallas TPU kernel: one fully fused ResidualBlock1D.

The generator trunk is a stack of ResidualBlock1D (reference
attentions.py:476-551): conv1 -> mask -> APTx -> conv2 -> [CBAM if
non-causal] -> + residual -> mask -> APTx.  Measured on TPU v5e (slope
method, see benchmarks/README.md): XLA runs the k=3 C=512 conv at ~76% of
bf16 peak and pays an HBM pass per chain stage; a Pallas shifted-matmul conv
alone reaches ~99% of peak.

This kernel runs the *entire block* for one batch element per grid step:

  * both convolutions as k shifted (T, C) @ (C, C') MXU matmuls with the
    activation slab resident in VMEM (SAME padding for non-causal, left-only
    for causal blocks — reference CausalConv1da, attentions.py:422-474),
  * the optional 1x1 residual projection as one more matmul,
  * the masked-pool -> MLP -> sigmoid CBAM gate chain (non-causal only,
    reference attentions.py:367-419) entirely on the VPU,
  * the tail (+residual, mask, APTx) fused into the same pass.

HBM traffic: read x once, write out once; weights stay resident across the
batch grid.  Masks are rebuilt from per-row lengths (contiguous-suffix
masks, the framework convention in core/masking.py), so no mask traffic.

Weight-norm folding (g * v / ||v||) happens outside the kernel — it is a
(k, C, C') elementwise op XLA fuses into the input pipeline.

Scope: inference (deterministic) path, dilation 1, "weight" norm (identity
norms), taptx activation, lane-aligned channels.  The XLA path in
nn/blocks.py remains the default, the training path, and the parity
reference; parity is tested in interpret mode (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_NEG_INF = -1e30  # nn/pooling.py masked_max_pool fill
_SAM_FILL = -1e4  # nn/attention.py SAM logit fill


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shifted_conv(x, w_ref, b_ref, k: int, causal: bool, out_dtype):
    """(T, Cin) -> (T, Cout): k-tap conv as shifted MXU matmuls, f32 accum."""
    t, cin = x.shape
    cout = w_ref.shape[2]
    if causal:
        lo, hi = k - 1, 0
    else:
        lo = hi = k // 2
    parts = []  # Mosaic rejects zero-row operands, so skip empty pads
    if lo:
        parts.append(jnp.zeros((lo, cin), x.dtype))
    parts.append(x)
    if hi:
        parts.append(jnp.zeros((hi, cin), x.dtype))
    xp = jnp.concatenate(parts, axis=0) if len(parts) > 1 else x
    acc = jnp.zeros((t, cout), jnp.float32)
    for j in range(k):
        acc = acc + jnp.dot(xp[j:j + t], w_ref[j],
                            preferred_element_type=jnp.float32)
    acc = acc + b_ref[:]
    return acc.astype(out_dtype)


def _aptx(z, beta, gamma):
    return (1.0 + jnp.tanh(beta * z)) * (gamma * z)


def _kernel(k1: int, k2: int, sam_k: int, causal: bool, has_proj: bool,
            *refs):
    if causal:
        (len_ref, actp_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         *proj_refs, out_ref) = refs
    else:
        (len_ref, actp_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         cw1_ref, cb1_ref, cw2_ref, cb2_ref, sam_ref,
         *proj_refs, out_ref) = refs

    x = x_ref[0]  # (T, Cin), compute dtype
    t = x.shape[0]
    cdt = x.dtype  # slab tensors stay in the model compute dtype (VMEM
    # budget + parity with the XLA path, which runs bf16 end to end);
    # matmuls still accumulate fp32, small (T, 1)/(1, C) math stays fp32
    length = len_ref[pl.program_id(0), 0]
    beta = actp_ref[0, 0].astype(cdt)
    gamma = actp_ref[0, 1].astype(cdt)

    # residual branch (1x1 projection when channels change)
    if has_proj:
        pw_ref, pb_ref = proj_refs
        res = (jnp.dot(x, pw_ref[:], preferred_element_type=jnp.float32)
               + pb_ref[:]).astype(cdt)
    else:
        res = x

    # conv1 -> (identity norm) -> mask -> act
    h = _shifted_conv(x, w1_ref, b1_ref, k1, causal, cdt)
    valid_t_b = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) < length
    valid_t = valid_t_b.astype(cdt)
    h = _aptx(h * valid_t, beta, gamma)

    # conv2 -> (identity norm)
    z = _shifted_conv(h, w2_ref, b2_ref, k2, causal, cdt)

    if not causal:
        # --- CBAM gate chain (reference attentions.py:195-419)
        cout = z.shape[1]
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (t, cout), 0)
        valid = t_ids < length

        mx = jnp.max(jnp.where(valid, z, jnp.asarray(_NEG_INF, cdt)),
                     axis=0, keepdims=True).astype(jnp.float32)
        count = jnp.maximum(length.astype(jnp.float32), 1.0)
        av = jnp.sum((z * valid.astype(cdt)).astype(jnp.float32),
                     axis=0, keepdims=True) / count
        # (2, C) pooled stats; matmul operands in the compute dtype (as the
        # XLA path's nn.Dense does), accumulation in fp32
        pooled = jnp.concatenate([mx, av], axis=0).astype(cdt)
        hidden = jnp.maximum(
            jnp.dot(pooled, cw1_ref[:], preferred_element_type=jnp.float32)
            + cb1_ref[:], 0.0)
        mlp_out = jnp.dot(hidden.astype(cdt), cw2_ref[:],
                          preferred_element_type=jnp.float32) + cb2_ref[:]
        gate_c = jax.nn.sigmoid(mlp_out[0:1, :]
                                + mlp_out[1:2, :]).astype(cdt)

        y = z * gate_c * valid.astype(cdt)  # CAM output

        valid_t_f = valid_t_b.astype(jnp.float32)
        mx_t = jnp.max(y, axis=1, keepdims=True).astype(jnp.float32) * valid_t_f
        av_t = (jnp.mean(y.astype(jnp.float32), axis=1, keepdims=True)
                * valid_t_f)
        pad = sam_k // 2
        zpad = jnp.zeros((pad, 1), jnp.float32)
        mxp = jnp.concatenate([zpad, mx_t, zpad], axis=0)
        avp = jnp.concatenate([zpad, av_t, zpad], axis=0)
        logits = jnp.zeros((t, 1), jnp.float32)
        for j in range(sam_k):
            logits = logits + sam_ref[j, 0] * mxp[j:j + t] \
                            + sam_ref[j, 1] * avp[j:j + t]
        logits = jnp.where(valid_t_b, logits, _SAM_FILL)
        gate_t = (jax.nn.sigmoid(logits) * valid_t_f).astype(cdt)

        z = (y * gate_t + z) * valid.astype(cdt)  # CBAM residual, re-masked

    out = _aptx((z + res) * valid_t, beta, gamma)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "k1", "k2", "sam_k", "causal", "has_proj", "interpret"))
def _fused_block(x, lengths, act_p, conv_ws, cbam_ws, proj_ws, *,
                 k1, k2, sam_k, causal, has_proj, interpret):
    b, t, cin = x.shape
    t_pad = _round_up(t, 8)
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    w1, b1, w2, b2 = conv_ws
    cout = w2.shape[2]

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, t_pad, cin), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        full(w1), full(b1), full(w2), full(b2),
    ]
    args = [lengths.reshape(b, 1).astype(jnp.int32),
            act_p.reshape(1, 2).astype(jnp.float32), x, w1, b1, w2, b2]
    if not causal:
        cw1, cb1, cw2, cb2, sam_w = cbam_ws
        in_specs += [full(cw1), full(cb1), full(cw2), full(cb2),
                     pl.BlockSpec((sam_k, 2), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)]
        args += [cw1, cb1, cw2, cb2, sam_w]
    if has_proj:
        pw, pb = proj_ws
        in_specs += [full(pw), full(pb)]
        args += [pw, pb]

    kernel = functools.partial(_kernel, k1, k2, sam_k, causal, has_proj)
    # Large-channel blocks (e.g. 512->768 k=5 with resident weights) need
    # slightly more than the 16 MB default scoped-VMEM budget; the v5e core
    # has headroom above the compiler default.
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t_pad, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cout), x.dtype),
        compiler_params=None if interpret else compiler_params,
        interpret=interpret,
    )(*args)
    return out[:, :t, :]


def _fold_wn(p: dict, dtype) -> jax.Array:
    """Effective conv kernel from a WNConv param dict ({v, g} or {kernel})."""
    if "kernel" in p:
        return jnp.asarray(p["kernel"], dtype)
    v = jnp.asarray(p["v"], jnp.float32)
    g = jnp.asarray(p["g"], jnp.float32)
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes))
    return (v * (g / jnp.maximum(norm, 1e-12))).astype(dtype)


def fused_residual_block(
    x: jax.Array,
    lengths: jax.Array,
    block_params: dict,
    *,
    kernel_size: int,
    causal: bool,
    act_beta: jax.Array,
    act_gamma: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Run one ResidualBlock1D (weight-norm, taptx) as a single fused kernel.

    x: (B, T, Cin) in the model compute dtype; lengths: (B,) valid frame
    counts (contiguous masks only); block_params: the block's flax param
    subtree (conv1/conv2 [+ residual] [+ cbam]).  Exactly matches the XLA
    path in nn/blocks.py for deterministic (inference) calls.
    """
    b, t, cin = x.shape
    if interpret is None:  # Mosaic needs a TPU ("tpu"/tunneled "axon")
        interpret = jax.default_backend() == "cpu"

    dtype = x.dtype
    w1 = _fold_wn(block_params["conv1"], dtype)
    w2 = _fold_wn(block_params["conv2"], dtype)
    cout = w2.shape[2]
    if cin % LANES or cout % LANES:
        raise ValueError(f"fused block requires lane-aligned channels, "
                         f"got {cin}/{cout}")
    b1 = jnp.asarray(block_params["conv1"]["bias"],
                     jnp.float32).reshape(1, -1)
    b2 = jnp.asarray(block_params["conv2"]["bias"],
                     jnp.float32).reshape(1, -1)

    has_proj = "residual" in block_params
    proj_ws = ()
    if has_proj:
        proj_ws = (jnp.asarray(block_params["residual"]["kernel"],
                               dtype).reshape(cin, cout),
                   jnp.asarray(block_params["residual"]["bias"],
                               jnp.float32).reshape(1, cout))

    cbam_ws = ()
    sam_k = 0
    if not causal:
        # MLP weights in the compute dtype — the XLA path's nn.Dense casts
        # them to bf16 too, and it trims the resident-VMEM footprint
        cam = block_params["cbam"]["channel_attention"]
        cw1 = jnp.asarray(cam["mlp_0"]["kernel"], dtype)
        cb1 = jnp.asarray(cam["mlp_0"]["bias"], jnp.float32)
        cw2 = jnp.asarray(cam["mlp_2"]["kernel"], dtype)
        cb2 = jnp.asarray(cam["mlp_2"]["bias"], jnp.float32)
        h = cw1.shape[1]
        hp = _round_up(h, LANES)
        if hp != h:  # zero-pad MLP hidden to full lanes (relu(0)=0 is inert)
            cw1 = jnp.pad(cw1, ((0, 0), (0, hp - h)))
            cb1 = jnp.pad(cb1, ((0, hp - h),))
            cw2 = jnp.pad(cw2, ((0, hp - h), (0, 0)))
        sam_kernel = jnp.asarray(
            block_params["cbam"]["spatial_attention"]["conv"]["kernel"],
            jnp.float32)
        sam_k = sam_kernel.shape[0]
        cbam_ws = (cw1, cb1.reshape(1, hp), cw2, cb2.reshape(1, cout),
                   sam_kernel.reshape(sam_k, 2))

    act_p = jnp.stack([jnp.asarray(act_beta, jnp.float32),
                       jnp.asarray(act_gamma, jnp.float32)])
    return _fused_block(
        x, lengths, act_p, (w1, b1, w2, b2), cbam_ws, proj_ws,
        k1=kernel_size, k2=kernel_size, sam_k=sam_k, causal=causal,
        has_proj=has_proj, interpret=interpret)
