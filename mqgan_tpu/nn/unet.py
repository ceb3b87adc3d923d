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
from mqgan_tpu.nn.conv import WNConv


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


class ConvBlock(nn.Module):
    """reference preencoder.py:86-102."""

    c_out: int
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, m=None, deterministic: bool = True):
        c_in = x.shape[-1]
        x = _mask4(x, m)
        act = APTx()
        do = nn.Dropout(rate=self.dropout, deterministic=deterministic)
        y = do(act(WNConv(self.c_out, (3, 3), use_weight_norm=True,
                          dtype=self.dtype, name="conv1")(x)))
        y = do(act(WNConv(self.c_out, (3, 3), use_weight_norm=True,
                          dtype=self.dtype, name="conv2")(y)))
        if c_in == self.c_out:
            y = y + x
        return _mask4(y, m)


class UNetRefiner(nn.Module):
    base_ch: int = 128
    depth: int = 3
    dropout: float = 0.1
    out_features: int = 128  # mel channels (reproj output)
    dtype: jnp.dtype | None = None

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

        h = ConvBlock(chs[0], self.dropout, self.dtype, name="pre")(
            img, m, deterministic
        )

        skips, masks = [], []
        cur_mask = m
        for i in range(self.depth):
            skips.append(h)
            masks.append(cur_mask)
            # DownBlock: AvgPool (2,1) then ConvBlock (preencoder.py:105-114)
            b, t, f, c = h.shape
            h = h[:, : (t // 2) * 2].reshape(b, t // 2, 2, f, c).mean(axis=2)
            cur_mask = _downsample_mask(cur_mask) if cur_mask is not None else None
            h = ConvBlock(chs[i + 1], self.dropout, self.dtype, name=f"down{i}")(
                h, cur_mask, deterministic
            )

        h = ConvBlock(chs[-1], self.dropout, self.dtype, name="mid")(
            h, cur_mask, deterministic
        )

        for i in range(self.depth):
            # UpBlock: nearest x2, mask up, skip concat (preencoder.py:117-130)
            h = jnp.repeat(h, 2, axis=1)
            cur_mask = _upsample_mask(cur_mask) if cur_mask is not None else None
            skip = _crop_to_match(skips.pop(), h)
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBlock(
                chs[self.depth - i - 1], self.dropout, self.dtype, name=f"up{i}"
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
