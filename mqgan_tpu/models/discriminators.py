"""Spectrogram discriminators.

Behavioral spec (reference discriminators.py:70-311):

* MelSpectrogramPatchDiscriminator2D — a 2-D PatchGAN over (freq, time):
  spectral-norm conv ladder with per-layer (stride_h, stride_w), LeakyReLU
  after every conv, masked-SE block before the final conv, pad mask
  max-pooled (ceil mode) alongside the strides, fully padded patches zeroed.
  Returns (logits, valid-mask, optional intermediate features) — features
  skip layers 0, 1 and the last (ret_features_map, discriminators.py:104-108).
* MultiBinDiscriminator — splits the mel axis into n_bins equal bands, one
  independent patch-D per band with kernels (3, k) and time-only strides
  ((1,1) for the first n_no_strides layers, then (1,2)).

Layout: NHWC images (B, F, T, 1) (H=freq, W=time). Strides (sh, sw) act on
(F, T) exactly like the reference's (B, 1, F, T) NCHW.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.core.config import (
    MultiBinDiscriminatorConfig,
    PatchDiscriminatorConfig,
)
from mqgan_tpu.core.masking import sequence_mask
from mqgan_tpu.nn.se import ChannelSELayerMasked


def _maxpool2d_ceil_bool(mask: jax.Array, sh: int, sw: int) -> jax.Array:
    """(B, H, W) bool pad-mask -> ceil-mode max-pool with kernel=stride.

    Matches torch F.max_pool2d(mask.float(), (sh, sw), ceil_mode=True).bool()
    (reference discriminators.py:222-229): padded tail windows take max over
    the partial window only (torch ceil-mode pads with -inf => False here).
    """
    b, h, w = mask.shape
    ho, wo = -(-h // sh), -(-w // sw)
    m = jnp.pad(
        mask,
        ((0, 0), (0, ho * sh - h), (0, wo * sw - w)),
        constant_values=False,
    )
    return m.reshape(b, ho, sh, wo, sw).max(axis=(2, 4))


class MelSpectrogramPatchDiscriminator2D(nn.Module):
    mel_channels: int
    hidden_channels: Tuple[int, ...] = (64, 128, 256, 512)
    kernel_sizes: Tuple = (7, 5, 5, 3, 3)
    strides: Tuple = (2, 2)  # int | (sh, sw) | per-layer list of (sh, sw)
    lengthwise_only: bool = False
    dtype: jnp.dtype | None = None

    @classmethod
    def from_config(cls, mel_channels: int, cfg: PatchDiscriminatorConfig, dtype=None):
        return cls(
            mel_channels=mel_channels,
            hidden_channels=tuple(cfg.hidden_channels),
            kernel_sizes=tuple(cfg.kernel_sizes),
            strides=tuple(cfg.strides),
            dtype=dtype,
        )

    def _layer_params(self):
        ks = list(self.kernel_sizes)
        assert len(ks) == len(self.hidden_channels) + 1
        s = self.strides
        if isinstance(s, int):
            layer_strides = [(1, s)] * len(ks)
        elif isinstance(s, tuple) and len(s) == 2 and all(
            isinstance(v, int) for v in s
        ):
            layer_strides = [tuple(s)] * len(ks)
        else:
            assert len(s) == len(ks), "stride list must match kernel_sizes"
            layer_strides = [tuple(v) for v in s]

        layers = []
        for out_ch, k, (sh, sw) in zip(
            self.hidden_channels, ks[:-1], layer_strides[:-1]
        ):
            if self.lengthwise_only:
                kernel, stride, padding = (1, k), (1, sw), (0, (k - 1) // 2)
            else:
                k1, k2 = (k if isinstance(k, tuple) else (k, k))
                kernel, stride = (k1, k2), (sh, sw)
                padding = ((k1 - 1) // 2, (k2 - 1) // 2)
            layers.append((out_ch, kernel, stride, padding))

        k = ks[-1]
        k1, k2 = (k if isinstance(k, tuple) else (k, k))
        if self.lengthwise_only:
            layers.append((1, (1, k), (1, 1), (0, (k - 1) // 2)))
        else:
            layers.append((1, (k1, k2), (1, 1), ((k1 - 1) // 2, (k2 - 1) // 2)))
        return layers

    @property
    def ret_features_map(self) -> List[bool]:
        m = [True] * (len(self.hidden_channels) + 1)
        m[0] = m[1] = m[-1] = False
        return m

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, F)
        lengths: jax.Array,  # (B,)
        return_features: bool = False,
        update_stats: bool = False,
    ):
        b, t, f = x.shape
        assert f == self.mel_channels

        tmask = sequence_mask(t, lengths)  # (B, T) True=pad
        pad_mask = jnp.broadcast_to(tmask[:, None, :], (b, f, t))  # (B, F, T)

        out = jnp.transpose(x, (0, 2, 1))[..., None]  # (B, F, T, 1)
        if self.dtype is not None:
            out = out.astype(self.dtype)

        layers = self._layer_params()
        n_layers = len(layers)
        features = []
        ret_map = self.ret_features_map

        for i, (out_ch, kernel, stride, padding) in enumerate(layers):
            if i == n_layers - 1:
                out = ChannelSELayerMasked(
                    num_channels=out.shape[-1], reduction_ratio=8,
                    dtype=self.dtype, name="se_block",
                )(out, pad_mask)

            conv = nn.SpectralNorm(
                nn.Conv(
                    out_ch, kernel, strides=stride,
                    padding=[(padding[0], padding[0]), (padding[1], padding[1])],
                    dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.02),
                    bias_init=nn.initializers.zeros_init(),
                    name=f"convs_{i}",
                ),
                error_on_non_matrix=False,
            )
            out = nn.leaky_relu(conv(out, update_stats=update_stats), 0.2)

            sh, sw = stride
            if sh > 1 or sw > 1:
                pad_mask = _maxpool2d_ceil_bool(pad_mask, sh, sw)

            out = jnp.where(pad_mask[..., None], jnp.zeros((), out.dtype), out)

            if return_features and ret_map[i]:
                features.append((out, pad_mask))

        patch_mask = ~pad_mask  # True = valid (reference discriminators.py:238)
        if return_features:
            return out, patch_mask, features
        return out, patch_mask


class MultiBinDiscriminator(nn.Module):
    mel_channels: int
    n_bins: int = 4
    hidden_channels: Tuple[int, ...] = (64, 128, 256, 512)
    kernel_sizes: Tuple[int, ...] = (7, 5, 5, 3, 3)
    n_no_strides: int = 2
    dtype: jnp.dtype | None = None

    @classmethod
    def from_config(cls, mel_channels: int, cfg: MultiBinDiscriminatorConfig, dtype=None):
        return cls(
            mel_channels=mel_channels,
            n_bins=cfg.n_bins,
            hidden_channels=tuple(cfg.hidden_channels),
            kernel_sizes=tuple(cfg.kernel_sizes),
            n_no_strides=cfg.n_no_strides,
            dtype=dtype,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, F) full spectrogram
        lengths: jax.Array,
        return_features: bool = False,
        update_stats: bool = False,
    ):
        assert self.mel_channels % self.n_bins == 0
        bin_size = self.mel_channels // self.n_bins
        strides = [
            (1, 1) if i < self.n_no_strides else (1, 2)
            for i in range(len(self.kernel_sizes))
        ]
        ksizes = tuple((3, k) for k in self.kernel_sizes)

        outs, masks, feats = [], [], []
        for i in range(self.n_bins):
            sub = x[..., i * bin_size : (i + 1) * bin_size]
            disc = MelSpectrogramPatchDiscriminator2D(
                mel_channels=bin_size,
                hidden_channels=tuple(self.hidden_channels),
                kernel_sizes=ksizes,
                strides=tuple(strides),
                dtype=self.dtype,
                name=f"discriminators_{i}",
            )
            if return_features:
                o, m, fs = disc(sub, lengths, True, update_stats)
                outs.append(o); masks.append(m); feats.append(fs)
            else:
                o, m = disc(sub, lengths, False, update_stats)
                outs.append(o); masks.append(m)

        if return_features:
            return outs, masks, feats
        return outs, masks
