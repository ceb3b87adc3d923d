"""Waveform discriminators for adversarial vocoder training (net-new; the
HiFi-GAN MPD/MSD pair from arXiv:2010.05646, referenced in PAPERS.md).

* MultiPeriodDiscriminator: reshapes the waveform into (T/p, p) images per
  period p and runs strided 2-D conv ladders — catches periodic artifacts.
* MultiScaleDiscriminator: 1-D conv ladders on the raw and 2x/4x
  average-pooled waveform — catches long-range envelope artifacts.

Channels-last layouts throughout; all discriminators return
(logits, feature_maps) lists for LSGAN + feature-matching objectives
(losses/gan.py, losses/recon.py are reused unchanged).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.nn.conv import WNConv


class PeriodDiscriminator(nn.Module):
    period: int
    channels: Tuple[int, ...] = (32, 128, 512, 1024)
    kernel_size: int = 5
    stride: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, wav: jax.Array):
        """wav (B, T) -> (logits (B, H', 1, 1), feature maps)."""
        b, t = wav.shape
        p = self.period
        pad = (-t) % p
        if pad:
            # reflect padding like HiFi-GAN's F.pad(..., 'reflect'): the
            # edge sample is NOT duplicated
            wav = jnp.concatenate(
                [wav, wav[:, t - pad - 1 : t - 1][:, ::-1]], axis=1
            )
        x = wav.reshape(b, -1, p, 1)  # (B, T/p, p, 1) NHWC
        if self.dtype is not None:
            x = x.astype(self.dtype)

        fmaps: List[jax.Array] = []
        k = self.kernel_size
        for i, ch in enumerate(self.channels):
            x = WNConv(ch, (k, 1), strides=(self.stride, 1),
                       padding=[((k - 1) // 2, (k - 1) // 2), (0, 0)],
                       use_weight_norm=True, dtype=self.dtype,
                       name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            fmaps.append(x)
        x = WNConv(1024, (k, 1), padding=[((k - 1) // 2, (k - 1) // 2), (0, 0)],
                   use_weight_norm=True, dtype=self.dtype, name="conv_pen")(x)
        x = nn.leaky_relu(x, 0.1)
        fmaps.append(x)
        logits = WNConv(1, (3, 1), padding=[(1, 1), (0, 0)],
                        use_weight_norm=True, dtype=self.dtype,
                        name="conv_post")(x)
        fmaps.append(logits)
        return logits, fmaps


class ScaleDiscriminator(nn.Module):
    channels: Tuple[int, ...] = (128, 128, 256, 512, 1024, 1024)
    kernel_sizes: Tuple[int, ...] = (15, 41, 41, 41, 41, 5)
    strides: Tuple[int, ...] = (1, 2, 2, 4, 4, 1)
    groups: Tuple[int, ...] = (1, 4, 16, 16, 16, 1)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, wav: jax.Array):
        """wav (B, T) -> (logits (B, T', 1), feature maps)."""
        x = wav[..., None]  # (B, T, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        fmaps: List[jax.Array] = []
        for i, (ch, k, s, g) in enumerate(zip(self.channels, self.kernel_sizes,
                                              self.strides, self.groups)):
            x = WNConv(ch, (k,), strides=(s,),
                       padding=[((k - 1) // 2, (k - 1) // 2)],
                       feature_group_count=g if x.shape[-1] % g == 0 else 1,
                       use_weight_norm=True, dtype=self.dtype,
                       name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            fmaps.append(x)
        logits = WNConv(1, (3,), padding=[(1, 1)], use_weight_norm=True,
                        dtype=self.dtype, name="conv_post")(x)
        fmaps.append(logits)
        return logits, fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, wav: jax.Array):
        outs, fmaps = [], []
        for p in self.periods:
            o, f = PeriodDiscriminator(period=p, dtype=self.dtype,
                                       name=f"period_{p}")(wav)
            outs.append(o)
            fmaps.append(f)
        return outs, fmaps


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, wav: jax.Array):
        outs, fmaps = [], []
        x = wav
        for i in range(self.n_scales):
            if i > 0:
                b, t = x.shape
                x = x[:, : (t // 2) * 2].reshape(b, t // 2, 2).mean(-1)
            o, f = ScaleDiscriminator(dtype=self.dtype, name=f"scale_{i}")(x)
            outs.append(o)
            fmaps.append(f)
        return outs, fmaps


def adversarial_g_loss(fake_logit_lists: Sequence[Sequence[jax.Array]]):
    """LSGAN generator loss summed over all sub-discriminators."""
    total = jnp.zeros((), jnp.float32)
    for outs in fake_logit_lists:
        for o in outs:
            total = total + jnp.mean(jnp.square(o.astype(jnp.float32) - 1.0))
    return total


def adversarial_d_loss(real_logit_lists, fake_logit_lists):
    total = jnp.zeros((), jnp.float32)
    for reals, fakes in zip(real_logit_lists, fake_logit_lists):
        for r, f in zip(reals, fakes):
            total = total + jnp.mean(jnp.square(r.astype(jnp.float32) - 1.0))
            total = total + jnp.mean(jnp.square(f.astype(jnp.float32)))
    return total


def feature_matching_loss(real_fmap_lists, fake_fmap_lists):
    """Mean L1 between real (stop-grad) and fake feature maps across every
    sub-discriminator and layer."""
    total = jnp.zeros((), jnp.float32)
    n = 0
    for rf_layers, ff_layers in zip(real_fmap_lists, fake_fmap_lists):
        # rf_layers: list over layers for one sub-discriminator
        for r, f in zip(rf_layers, ff_layers):
            total = total + jnp.mean(jnp.abs(
                jax.lax.stop_gradient(r).astype(jnp.float32)
                - f.astype(jnp.float32)
            ))
            n += 1
    return total / max(n, 1)
