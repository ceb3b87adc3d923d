"""Multi-resolution STFT loss for vocoder training (net-new capability;
standard spectral objective from the Parallel WaveGAN / multi-band MelGAN
line of work referenced in PAPERS.md).

L = mean over resolutions of [ spectral convergence + log-magnitude L1 ].
Built on signal.stft, fully jittable.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from mqgan_tpu.signal.stft import stft

DEFAULT_RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    (512, 128, 512),
    (1024, 256, 1024),
    (2048, 512, 2048),
)


def _stft_mag(x: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    return jnp.abs(stft(x.astype(jnp.float32), n_fft, hop, win))


def spectral_convergence(mag_pred: jax.Array, mag_true: jax.Array) -> jax.Array:
    num = jnp.sqrt(jnp.sum(jnp.square(mag_true - mag_pred)))
    den = jnp.sqrt(jnp.sum(jnp.square(mag_true))) + 1e-7
    return num / den


def log_magnitude_l1(mag_pred: jax.Array, mag_true: jax.Array) -> jax.Array:
    return jnp.mean(
        jnp.abs(jnp.log(mag_true + 1e-7) - jnp.log(mag_pred + 1e-7))
    )


def multi_resolution_stft_loss(
    wav_pred: jax.Array,  # (B, T_samples)
    wav_true: jax.Array,  # (B, T_samples)
    resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
) -> jax.Array:
    total = jnp.zeros((), jnp.float32)
    for n_fft, hop, win in resolutions:
        mp = _stft_mag(wav_pred, n_fft, hop, win)
        mt = _stft_mag(wav_true, n_fft, hop, win)
        total = total + spectral_convergence(mp, mt) + log_magnitude_l1(mp, mt)
    return total / len(resolutions)
