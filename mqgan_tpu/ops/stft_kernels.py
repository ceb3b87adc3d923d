"""Pallas TPU kernel: fused DFT -> |.| -> mel -> log front end.

TPUs have no FFT unit — XLA lowers jnp.fft.rfft to matmuls anyway — so the
mel front end is really four dependent matmul/elementwise stages
(frame x cos, frame x sin, magnitude, mel projection, log). The XLA path
(signal/mel.py) materializes each stage in HBM; this kernel keeps a frame
tile resident in VMEM and accumulates the mel projection over frequency
tiles, writing only the final (frames, n_mels) result.

Grid: (frame_tiles, freq_tiles) with the frequency axis innermost as a
reduction over the output block:

    re  = frames_tile @ cos_tile      (TILE_F x n_fft) @ (n_fft x TILE_K)
    im  = frames_tile @ sin_tile
    mag = sqrt(re^2 + im^2)
    out += mag @ fbank_tile           (TILE_F x TILE_K) @ (TILE_K x n_mels)
    ... last freq tile: out = log(clamp(out, 1e-5))

Numerics match signal.mel.log_mel to ~1e-3 (fp32 matmul DFT vs rfft).
`mel_frontend_pallas` is a drop-in for MelFrontend's jitted core; the
XLA rfft path remains the default and parity reference.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mqgan_tpu.core.config import SpectrogramConfig
from mqgan_tpu.signal.mel import LOG_CLIP_VAL, mel_filterbank
from mqgan_tpu.signal.stft import _padded_window, frame_signal

TILE_FRAMES = 128
TILE_FREQ = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def dft_mel_tables(cfg: SpectrogramConfig):
    """Precompute (cos, sin, fbank) with the window folded into the DFT and
    the frequency axis padded to a lane multiple.

    cos/sin: (n_fft, F_pad); fbank: (F_pad, M_pad)."""
    n_fft = cfg.filter_length
    n_freq = cfg.n_freqs
    f_pad = _round_up(n_freq, TILE_FREQ)
    m_pad = _round_up(cfg.n_mel_channels, 128)

    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    win = np.asarray(_padded_window(cfg.win_length, n_fft))[:, None]
    cos = np.zeros((n_fft, f_pad), np.float32)
    sin = np.zeros((n_fft, f_pad), np.float32)
    cos[:, :n_freq] = np.cos(ang) * win
    sin[:, :n_freq] = np.sin(ang) * win

    fb = mel_filterbank(cfg)  # (n_freq, n_mels)
    fbank = np.zeros((f_pad, m_pad), np.float32)
    fbank[:n_freq, : cfg.n_mel_channels] = fb
    return jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(fbank)


def _kernel(frames_ref, cos_ref, sin_ref, fbank_ref, out_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    re = jnp.dot(frames_ref[:], cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames_ref[:], sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    partial = jnp.dot(mag, fbank_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = jnp.log(jnp.clip(out_ref[:], min=LOG_CLIP_VAL))


@functools.partial(jax.jit, static_argnames=("n_fft", "n_mels", "interpret"))
def _log_mel_frames_pallas(frames, cos, sin, fbank, n_fft: int, n_mels: int,
                           interpret: bool = False):
    """frames (N, n_fft) fp32 -> (N, n_mels) log-mel."""
    n = frames.shape[0]
    n_pad = _round_up(n, TILE_FRAMES)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    f_pad = cos.shape[1]
    m_pad = fbank.shape[1]

    grid = (n_pad // TILE_FRAMES, f_pad // TILE_FREQ)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_FRAMES, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, TILE_FREQ), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, TILE_FREQ), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_FREQ, m_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_FRAMES, m_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_fft * f_pad * 2 + 2 * n_pad * f_pad * m_pad,
            bytes_accessed=4 * (n_pad * n_fft + 2 * n_fft * f_pad
                                + f_pad * m_pad + n_pad * m_pad),
            transcendentals=n_pad * (f_pad + m_pad),
        ),
        interpret=interpret,
    )(frames, cos, sin, fbank)
    return out[:n, :n_mels]


class PallasMelFrontend:
    """Drop-in alternative to signal.mel.MelFrontend using the fused kernel."""

    def __init__(self, cfg: SpectrogramConfig, interpret: bool = False):
        self.cfg = cfg
        self.interpret = interpret
        self._cos, self._sin, self._fbank = dft_mel_tables(cfg)

    def __call__(self, wav: jax.Array) -> jax.Array:
        squeeze = wav.ndim == 1
        if squeeze:
            wav = wav[None]
        frames = frame_signal(
            wav.astype(jnp.float32), self.cfg.filter_length,
            self.cfg.hop_length, center=True,
        )  # (B, T, n_fft)
        b, t, n_fft = frames.shape
        out = _log_mel_frames_pallas(
            frames.reshape(b * t, n_fft), self._cos, self._sin, self._fbank,
            n_fft=n_fft, n_mels=self.cfg.n_mel_channels,
            interpret=self.interpret,
        ).reshape(b, t, self.cfg.n_mel_channels)
        return out[0] if squeeze else out
