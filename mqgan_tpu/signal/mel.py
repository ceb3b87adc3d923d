"""Log-mel front end, numerically matched to torchaudio.transforms.MelSpectrogram
as configured by the reference (convert_spectrograms.py:19-35):

    power=1.0 (magnitude), center=True reflect pad, Hann window,
    HTK mel scale, no filterbank norm, then log(clamp(mel, 1e-5)).

The hot path is `log_mel`: framing -> windowed rFFT -> |.| -> mel matmul ->
log-clamp, all fused under jit. The mel projection is a (F, n_mels) matmul
that XLA tiles onto the MXU; ops/stft_kernels.py offers a full matmul-DFT
variant for benchmarking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mqgan_tpu.core.config import SpectrogramConfig
from mqgan_tpu.signal.stft import frame_signal, _padded_window

LOG_CLIP_VAL = 1e-5  # reference convert_spectrograms.py:17


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Triangular HTK-scale filterbank, (n_freqs, n_mels), norm=None.

    Matches torchaudio.functional.melscale_fbanks(mel_scale="htk", norm=None):
    FFT bin frequencies are linspace(0, sample_rate//2, n_freqs); mel points
    are n_mels+2 uniform points in HTK-mel between f_min and f_max.
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = (-slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def mel_filterbank(cfg: SpectrogramConfig) -> np.ndarray:
    return melscale_fbanks(
        n_freqs=cfg.n_freqs,
        f_min=cfg.mel_fmin,
        f_max=cfg.mel_fmax,
        n_mels=cfg.n_mel_channels,
        sample_rate=cfg.sampling_rate,
    )


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def _log_mel_impl(wav, fbank, n_fft, hop_length, win_length):
    # computation follows input placement (committed arrays), so the
    # front end runs on whatever device the caller put wav/fbank on
    frames = frame_signal(wav.astype(jnp.float32), n_fft, hop_length, center=True)
    w = _padded_window(win_length, n_fft)
    spec = jnp.fft.rfft(frames * w, axis=-1)  # (B, T, F) complex
    mag = jnp.abs(spec)  # power=1.0
    mel = jnp.dot(mag, fbank, preferred_element_type=jnp.float32)  # (B, T, n_mels)
    return jnp.log(jnp.clip(mel, min=LOG_CLIP_VAL))


class MelFrontend:
    """wav -> log-mel, (B, T_samples) -> (B, frames, n_mels) time-major.

    Equivalent of TorchMelSpectrogramExtractor.get_mel_from_wav
    (reference convert_spectrograms.py:31-35), already transposed to
    (frames, n_mels).
    """

    def __init__(self, cfg: SpectrogramConfig, device=None):
        """device: optional jax.Device to pin the computation to (e.g.
        jax.devices('cpu')[0] for host-side batch tools — per-file wav
        lengths would otherwise trigger one accelerator compile each)."""
        self.cfg = cfg
        self.device = device
        fbank = jnp.asarray(mel_filterbank(cfg))
        self._fbank = jax.device_put(fbank, device) if device else fbank

    def __call__(self, wav: jax.Array) -> jax.Array:
        squeeze = wav.ndim == 1
        if squeeze:
            wav = wav[None]
        if self.device is not None:
            wav = jax.device_put(jnp.asarray(wav), self.device)
        out = _log_mel_impl(
            wav,
            self._fbank,
            self.cfg.filter_length,
            self.cfg.hop_length,
            self.cfg.win_length,
        )
        return out[0] if squeeze else out

    def frames_for(self, num_samples: int) -> int:
        return num_samples // self.cfg.hop_length + 1
