"""UNetRefiner — GAN-trained additive-residual head over reconstructed mels.

Behavioral spec (reference preencoder.py:29-202): input (B, T, F) with F =
mel + hidden-proj channels; pad T to a multiple of 2^depth; ConvBlock
(2x 3x3 weight-norm conv + APTx + dropout + residual-if-matching) ladder;
time-only AvgPool /2 downs, nearest x2 ups with center-cropped skip concat;
final 3x3 conv to one plane; crop to original T; Linear reproj
(mel+hidden -> mel), bias-free.

Layout: NHWC images (B, T, F, C_planes); masks down/up-sampled alongside
(max-pool keeps padded=True; reference preencoder.py:63-70).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.nn.activations import APTx
from mqgan_tpu.nn.conv import WNConv, weight_norm_kernel


def _mask4(x: jax.Array, m: jax.Array | None) -> jax.Array:
    """x: (B, T, F, C); m: (B, T) True=pad."""
    if m is None:
        return x
    return jnp.where(m[:, :, None, None], jnp.zeros((), x.dtype), x)


def _downsample_mask(m: jax.Array) -> jax.Array:
    """(B, T) -> (B, T//2): torch max_pool (2,1) — True survives if any."""
    b, t = m.shape
    return m[:, : (t // 2) * 2].reshape(b, t // 2, 2).max(axis=-1)


def _upsample_mask(m: jax.Array) -> jax.Array:
    return jnp.repeat(m, 2, axis=1)


def _crop_to_match(skip: jax.Array, like: jax.Array) -> jax.Array:
    """Center-crop skip's T dim to match (reference crop_to_match,
    preencoder.py:73-82)."""
    dt = skip.shape[1] - like.shape[1]
    if dt > 0:
        start = dt // 2
        return skip[:, start : start + like.shape[1]]
    return skip


def _int8_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """3x3 SAME conv on the int8 MXU path: per-output-channel weight scales,
    per-tensor dynamic activation scale (no calibration needed). Measured
    1.32x faster than the bf16 conv at the refiner mid-level shape including
    the quantize/dequantize passes (docs/SERVING.md, int8 table)."""
    sw = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
    sx = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(
        jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw) + bias).astype(x.dtype)


def _pack_kernel_w(w: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, 3, 2*Cin, 2*Cout) packed-W conv kernel.

    Space-to-depth along the frequency axis: a 3x3 conv on (H, W, C) equals
    a 3x3 conv on (H, W/2, 2C) with this rearranged kernel (half the entries
    structurally zero).  Output column w = 2w'+p reads input column
    j = p+dw-1 = packed column w'+d' phase q, with d' = (j+2)//2 - 1 and
    q = (j+2) % 2.  Linear in w, so gradients flow through to v/g unchanged.
    """
    kh, kw, cin, cout = w.shape
    wp = jnp.zeros((kh, 3, 2 * cin, 2 * cout), w.dtype)
    for p in range(2):
        for dw in range(kw):
            j = p + dw - 1
            dp = (j + 2) // 2 - 1
            q = (j + 2) % 2
            wp = wp.at[:, dp + 1, q * cin:(q + 1) * cin,
                       p * cout:(p + 1) * cout].add(w[:, dw])
    return wp


class ConvBlock(nn.Module):
    """reference preencoder.py:86-102.

    packed=True evaluates both convs in a packed-W layout ((B, H, W/2, 2C)
    space-to-depth): small-channel levels (C <= 64) waste MXU lanes as
    plain convs (measured 16.8 TF/s on the refiner's `pre` level vs 119-189
    TF/s for the wide levels); the packed form doubles the conv FLOPs but
    makes both matmul dims lane-dense, a large net win.  Numerically
    identical to the plain path (same params, same math, reordered); the
    dropout mask is drawn in packed layout — elementwise iid either way,
    so training statistics are unchanged (draws differ bitwise).
    """

    c_out: int
    dropout: float = 0.1
    dtype: jnp.dtype | None = None
    packed: bool = False
    # int8=True runs both convs on the int8 MXU path (inference only:
    # requires deterministic=True at call time; training calls fall back).
    # Same param tree; ~1e-2-level output deviation from dynamic symmetric
    # quantization — an opt-in serving speed/quality trade (docs/SERVING.md)
    int8: bool = False

    @nn.compact
    def __call__(self, x, m=None, deterministic: bool = True):
        c_in = x.shape[-1]
        x = _mask4(x, m)
        act = APTx()
        do = nn.Dropout(rate=self.dropout, deterministic=deterministic)
        conv1 = WNConv(self.c_out, (3, 3), use_weight_norm=True,
                       dtype=self.dtype, name="conv1")
        conv2 = WNConv(self.c_out, (3, 3), use_weight_norm=True,
                       dtype=self.dtype, name="conv2")

        if self.int8 and deterministic:
            # dummy calls declare the identical param tree (see below)
            d = conv1(x[:1, :2])
            _ = conv2(d)
            dt = self.dtype or x.dtype

            def fold(conv):
                p = conv.variables["params"]
                return (weight_norm_kernel(p["v"], p["g"]).astype(dt),
                        p["bias"].astype(jnp.float32))

            k1, b1 = fold(conv1)
            k2, b2 = fold(conv2)
            y = act(_int8_conv(x.astype(dt), k1, b1))
            y = act(_int8_conv(y, k2, b2))
            if c_in == self.c_out:
                y = y + x  # same result-dtype promotion as the plain path
            return _mask4(y, m)

        if self.packed and x.shape[2] % 2 == 0:
            # Tiny dummy calls declare the identical param tree; outputs are
            # unused and DCE'd under jit (same pattern as nn/blocks.py).
            d = conv1(x[:1, :2])
            _ = conv2(d)
            dt = self.dtype or x.dtype

            def packed_conv(conv, cin):
                p = conv.variables["params"]
                k = weight_norm_kernel(p["v"], p["g"]).astype(dt)
                bias = jnp.tile(p["bias"], 2).astype(jnp.float32)
                kp = _pack_kernel_w(k)
                def apply(t):
                    y = jax.lax.conv_general_dilated(
                        t.astype(dt), kp, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return y + bias.astype(y.dtype)
                return apply

            b, h, w, _ = x.shape
            xp = x.reshape(b, h, w // 2, 2 * c_in)
            y = do(act(packed_conv(conv1, c_in)(xp)))
            y = do(act(packed_conv(conv2, self.c_out)(y)))
            if c_in == self.c_out:
                y = y + xp
            y = y.reshape(b, h, w, self.c_out)
            return _mask4(y, m)

        y = do(act(conv1(x)))
        y = do(act(conv2(y)))
        if c_in == self.c_out:
            y = y + x
        return _mask4(y, m)


class UNetRefiner(nn.Module):
    base_ch: int = 128
    depth: int = 3
    dropout: float = 0.1
    out_features: int = 128  # mel channels (reproj output)
    dtype: jnp.dtype | None = None
    # remat=True recomputes each ConvBlock in the backward pass (stores only
    # block inputs): large-batch training memory relief, see PreEncoder.remat
    remat: bool = False
    # int8=True quantizes the wide ConvBlocks (down/mid/up — not the packed
    # pre level, whose convs are small) onto the int8 MXU path at inference
    int8: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, F) refiner input (already concatenated)
        pad_mask: jax.Array | None = None,  # (B, T)
        deterministic: bool = True,
    ) -> jax.Array:
        original_len = x.shape[1]
        mult = 1 << self.depth
        pad_len = (-original_len) % mult

        img = x[..., None]  # (B, T, F, 1)
        if pad_len:
            img = jnp.pad(img, ((0, 0), (0, pad_len), (0, 0), (0, 0)))
        if pad_mask is not None and pad_len:
            m = jnp.pad(pad_mask, ((0, 0), (0, pad_len)), constant_values=True)
        else:
            m = pad_mask

        chs = [self.base_ch * (2 ** i) for i in range(self.depth + 1)]
        # __call__ args: (self, x, m, deterministic) — call sites positional
        block = (nn.remat(ConvBlock, static_argnums=(3,))
                 if self.remat else ConvBlock)

        # the pre level runs at C=chs[0] over the full-resolution image; for
        # small base channels plain convs waste MXU lanes (see ConvBlock),
        # so evaluate it packed (numerically identical, same params)
        h = block(chs[0], self.dropout, packed=chs[0] <= 64,
                  dtype=self.dtype, name="pre")(img, m, deterministic)

        skips, masks = [], []
        cur_mask = m
        for i in range(self.depth):
            skips.append(h)
            masks.append(cur_mask)
            # DownBlock: AvgPool (2,1) then ConvBlock (preencoder.py:105-114)
            b, t, f, c = h.shape
            h = h[:, : (t // 2) * 2].reshape(b, t // 2, 2, f, c).mean(axis=2)
            cur_mask = _downsample_mask(cur_mask) if cur_mask is not None else None
            h = block(chs[i + 1], self.dropout, self.dtype,
                      int8=self.int8, name=f"down{i}")(
                h, cur_mask, deterministic
            )

        h = block(chs[-1], self.dropout, self.dtype, int8=self.int8,
                  name="mid")(
            h, cur_mask, deterministic
        )

        for i in range(self.depth):
            # UpBlock: nearest x2, mask up, skip concat (preencoder.py:117-130)
            h = jnp.repeat(h, 2, axis=1)
            cur_mask = _upsample_mask(cur_mask) if cur_mask is not None else None
            skip = _crop_to_match(skips.pop(), h)
            h = jnp.concatenate([h, skip], axis=-1)
            # note: packing the up blocks was measured and is a large LOSS
            # in the train step (wide concat Cin doubles the dominant conv);
            # only the pre level packs (1->64->64)
            h = block(
                chs[self.depth - i - 1], self.dropout, self.dtype,
                int8=self.int8, name=f"up{i}",
            )(h, cur_mask, deterministic)

        out = WNConv(1, (3, 3), use_weight_norm=True, dtype=self.dtype,
                     name="post")(_mask4(h, cur_mask))
        out = out[..., 0]  # (B, T', F)
        out = out[:, :original_len]

        if pad_mask is not None:
            out = jnp.where(pad_mask[:, :, None], jnp.zeros((), out.dtype), out)

        # bias-free reproj (mel + hidden -> mel), reference preencoder.py:166,200
        out = nn.Dense(self.out_features, use_bias=False, dtype=self.dtype,
                       name="reproj")(out)
        return out
