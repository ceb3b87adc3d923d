"""Jittable STFT / iSTFT, numerically matched to torch.stft / torch.istft.

Behavioral spec (reference stft.py:16-47 and torchaudio defaults used by
convert_spectrograms.py:19-29): center=True with reflect padding of
n_fft//2 on both sides, Hann window of win_length (zero-padded to n_fft when
shorter), one-sided rFFT, no normalization. `inverse` performs windowed
overlap-add divided by the squared-window envelope and trims n_fft//2 from
each side — torch.istft semantics.

TPU notes: framing is a gather with static shapes; the rFFT runs through
XLA's FFT. ops/stft_kernels.py provides an MXU matmul-DFT alternative that
fuses the mel projection; this module is the parity-grade reference path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window — matches torch.hann_window(win_length)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _padded_window(win_length: int, n_fft: int, dtype=jnp.float32) -> jax.Array:
    w = hann_window(win_length, dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = jnp.pad(w, (left, n_fft - win_length - left))
    return w


def num_frames(num_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    if center:
        return num_samples // hop_length + 1
    return (num_samples - n_fft) // hop_length + 1


def frame_signal(
    x: jax.Array, n_fft: int, hop_length: int, center: bool = True
) -> jax.Array:
    """(B, T_samples) -> (B, frames, n_fft) windowless frames."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    t = x.shape[-1]
    n = (t - n_fft) // hop_length + 1
    idx = (
        jnp.arange(n)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )  # (frames, n_fft)
    return x[:, idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center"))
def stft(
    x: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int = 2048,
    center: bool = True,
) -> jax.Array:
    """(B, T) real signal -> (B, n_fft//2+1, frames) complex64.

    Layout matches torch.stft (freq-major) for parity tests; prefer
    `stft_mag` / signal.mel for the compute path.
    """
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop_length, center)
    w = _padded_window(win_length, n_fft)
    spec = jnp.fft.rfft(frames * w, axis=-1)  # (B, frames, F)
    return jnp.swapaxes(spec, -1, -2)


def stft_mag_phase(x, n_fft=2048, hop_length=512, win_length=2048):
    """TorchSTFT.transform equivalent (reference stft.py:16-28)."""
    s = stft(x, n_fft, hop_length, win_length)
    return jnp.abs(s), jnp.angle(s)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "length"))
def istft(
    magnitude: jax.Array,
    phase: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int = 2048,
    length: int | None = None,
) -> jax.Array:
    """(B, F, frames) mag/phase -> (B, 1, samples). torch.istft semantics.

    Mirrors TorchSTFT.inverse (reference stft.py:30-47) including the final
    unsqueeze to (B, 1, samples).
    """
    spec = magnitude.astype(jnp.complex64) * jnp.exp(1j * phase.astype(jnp.complex64))
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)  # (B, N, n_fft)
    w = _padded_window(win_length, n_fft)
    frames = frames * w

    b, n, _ = frames.shape
    out_len = n_fft + hop_length * (n - 1)
    # Overlap-add via scatter-add at static index grid.
    idx = (jnp.arange(n)[:, None] * hop_length + jnp.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((b, out_len), frames.dtype).at[:, idx].add(frames.reshape(b, -1))
    env = jnp.zeros((out_len,), w.dtype).at[idx].add(jnp.tile(w * w, n))

    pad = n_fft // 2
    sig = sig[:, pad : out_len - pad]
    env = env[pad : out_len - pad]
    sig = sig / jnp.maximum(env, 1e-11)
    if length is not None:
        sig = sig[:, :length]
    return sig[:, None, :]  # (B, 1, samples), reference stft.py:47


class TPUSTFT:
    """Object-style wrapper mirroring the reference TorchSTFT interface
    (stft.py:5-55) for the vocoder path."""

    def __init__(self, filter_length=800, hop_length=200, win_length=800, window="hann"):
        del window  # hann only, like the reference
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length

    def transform(self, x):
        return stft_mag_phase(x, self.filter_length, self.hop_length, self.win_length)

    def inverse(self, magnitude, phase):
        return istft(magnitude, phase, self.filter_length, self.hop_length, self.win_length)

    def __call__(self, x):
        mag, ph = self.transform(x)
        return self.inverse(mag, ph)
