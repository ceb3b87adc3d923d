"""iSTFTNet-style neural vocoder generator (net-new capability).

The reference wraps an *external* pretrained iSTFTNet TorchScript generator
(istftnetfe.py:6-79; weights from HuggingFace per README.md:153-155) — the
network itself ships nowhere in the reference repo. This module provides a
trainable TPU-native equivalent so the full mel->waveform chain can be
trained inside this framework (signal/vocoder.py wraps it unchanged).

Architecture (after iSTFTNet, arXiv:2203.02395, V1-style): HiFi-GAN
upsampler with multi-receptive-field (MRF) ResBlocks, but only upsampling
to hop/istft_hop resolution and emitting (magnitude, phase) for a small
inverse STFT instead of raw samples — the iSTFT replaces the most expensive
upsampling stages.

Output contract matches ISTFTNetFE's `gen`: mel (B, n_mels, T) ->
(spec, phase) each (B, istft_n_fft//2+1, T * prod(upsample_rates));
internally everything is channels-last.

Waveform sample rate relation:
    samples per mel frame = prod(upsample_rates) * istft_hop == mel hop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mqgan_tpu.nn.conv import WNConv


class MRFBlock(nn.Module):
    """HiFi-GAN multi-receptive-field residual block: parallel dilated
    conv stacks with LeakyReLU, averaged."""

    channels: int
    kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        acc = None
        for k in self.kernel_sizes:
            h = x
            for d in self.dilations:
                y = nn.leaky_relu(h, 0.1)
                y = WNConv(self.channels, (k,), dilation=(d,),
                           use_weight_norm=True, dtype=self.dtype,
                           name=f"conv_k{k}_d{d}")(y)
                y = nn.leaky_relu(y, 0.1)
                y = WNConv(self.channels, (k,), dilation=(1,),
                           use_weight_norm=True, dtype=self.dtype,
                           name=f"conv_k{k}_d{d}_post")(y)
                h = h + y
            acc = h if acc is None else acc + h
        return acc / len(self.kernel_sizes)


class ISTFTNetGenerator(nn.Module):
    n_mels: int = 128
    upsample_rates: Tuple[int, ...] = (8, 8)
    # odd kernels: the repeat+conv upsampler uses symmetric same padding
    # (HiFi-GAN uses even k with ConvTranspose; k=2r+1 is the repeat+conv
    # equivalent receptive field)
    upsample_kernel_sizes: Tuple[int, ...] = (17, 17)
    upsample_initial_channel: int = 512
    istft_n_fft: int = 16  # F = n_fft//2 + 1
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype | None = None

    @property
    def total_upsample(self) -> int:
        total = 1
        for r in self.upsample_rates:
            total *= r
        return total

    @nn.compact
    def __call__(self, mel: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """mel (B, n_mels, T) -> (spec, phase) each (B, n_fft//2+1, T')."""
        x = jnp.transpose(mel, (0, 2, 1))  # channels-last (B, T, n_mels)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        ch = self.upsample_initial_channel
        x = WNConv(ch, (7,), use_weight_norm=True, dtype=self.dtype,
                   name="conv_pre")(x)

        for i, (r, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch //= 2
            x = nn.leaky_relu(x, 0.1)
            # nearest-upsample + conv (transposed-conv equivalent without
            # checkerboard artifacts; standard HiFi-GAN alternative)
            x = jnp.repeat(x, r, axis=1)
            x = WNConv(ch, (k,), use_weight_norm=True, dtype=self.dtype,
                       name=f"up_{i}")(x)
            x = MRFBlock(ch, self.resblock_kernel_sizes,
                         self.resblock_dilations, dtype=self.dtype,
                         name=f"mrf_{i}")(x)

        x = nn.leaky_relu(x, 0.1)
        n_freq = self.istft_n_fft // 2 + 1
        x = WNConv(2 * n_freq, (7,), use_weight_norm=True, dtype=self.dtype,
                   name="conv_post")(x)
        x = x.astype(jnp.float32)

        # iSTFTNet heads: magnitude via exp (clamped), phase via sin-bounded
        # angle (keeps the head smooth; istft consumes mag * e^{i phase})
        spec = jnp.exp(jnp.clip(x[..., :n_freq], -11.0, 6.0))
        phase = jnp.pi * jnp.sin(x[..., n_freq:])
        # back to the ISTFTNetFE (B, F, T') contract
        return jnp.transpose(spec, (0, 2, 1)), jnp.transpose(phase, (0, 2, 1))


def build_vocoder_fe(gen: ISTFTNetGenerator, params, istft_hop: int):
    """Wire a (possibly trained) generator into the reference-compatible
    ISTFTNetFE wrapper (signal/vocoder.py)."""
    from mqgan_tpu.signal.stft import TPUSTFT
    from mqgan_tpu.signal.vocoder import ISTFTNetFE

    import jax as _jax

    gen_fn = _jax.jit(lambda mel: gen.apply(params, mel))
    stft = TPUSTFT(filter_length=gen.istft_n_fft, hop_length=istft_hop,
                   win_length=gen.istft_n_fft)
    return ISTFTNetFE(gen=gen_fn, stft=stft)
