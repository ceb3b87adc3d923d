"""Mel inversion + Griffin-Lim phase recovery (fallback vocoder).

The reference vocodes via an external pretrained iSTFTNet generator
(README.md:153-155) which is not shipped in-repo. For a self-contained
wav-out path (demo, smoke tests) we provide the classic fallback: project
log-mels back to linear magnitudes with the filterbank pseudo-inverse, then
recover phase by Griffin-Lim iterations built on signal.stft — a jittable
lax.fori_loop, so the whole inversion runs on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mqgan_tpu.core.config import SpectrogramConfig
from mqgan_tpu.signal.mel import LOG_CLIP_VAL, mel_filterbank
from mqgan_tpu.signal.stft import istft, stft


def mel_pseudo_inverse(cfg: SpectrogramConfig) -> np.ndarray:
    """(n_mels, n_freqs) Moore-Penrose pseudo-inverse of the filterbank,
    clamped to non-negative (magnitudes)."""
    fb = mel_filterbank(cfg)  # (n_freqs, n_mels)
    # keep the signed pinv: clamping its negative lobes badly distorts the
    # reconstruction; non-negativity is enforced on the resulting magnitudes
    return np.linalg.pinv(fb).astype(np.float32)  # (n_mels, n_freqs)


def log_mel_to_linear(log_mel: jax.Array, inv_fb: jax.Array) -> jax.Array:
    """(B, T, n_mels) log-mel -> (B, F, T) linear magnitude."""
    mel = jnp.exp(log_mel)  # undo log(clamp(mel, 1e-5))
    mag = jnp.einsum("btm,mf->btf", mel, inv_fb)
    return jnp.maximum(jnp.swapaxes(mag, -1, -2), 0.0)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "n_iter"))
def griffin_lim(
    magnitude: jax.Array,  # (B, F, T)
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iter: int = 32,
    momentum: float = 0.99,
) -> jax.Array:
    """Phase recovery; returns (B, 1, samples)."""
    b, f, t = magnitude.shape
    angles = jnp.zeros_like(magnitude)

    def body(_, carry):
        angles, prev = carry
        wav = istft(magnitude, angles, n_fft, hop_length, win_length)
        spec = stft(wav[:, 0, :], n_fft, hop_length, win_length)
        spec = spec[:, :, :t]
        # momentum acceleration (fast Griffin-Lim)
        update = spec - (momentum / (1.0 + momentum)) * prev
        new_angles = jnp.angle(update)
        return new_angles, spec

    angles, _ = jax.lax.fori_loop(
        0, n_iter, body, (angles, jnp.zeros(magnitude.shape, jnp.complex64))
    )
    return istft(magnitude, angles, n_fft, hop_length, win_length)


class GriffinLimVocoder:
    """log-mel (B, T, n_mels) -> waveform (B, 1, samples)."""

    def __init__(self, cfg: SpectrogramConfig, n_iter: int = 32):
        self.cfg = cfg
        self.n_iter = n_iter
        self._inv_fb = jnp.asarray(mel_pseudo_inverse(cfg))

    def __call__(self, log_mel: jax.Array) -> jax.Array:
        if log_mel.ndim == 2:
            log_mel = log_mel[None]
        mag = log_mel_to_linear(log_mel, self._inv_fb)
        return griffin_lim(
            mag, self.cfg.filter_length, self.cfg.hop_length,
            self.cfg.win_length, n_iter=self.n_iter,
        )
