"""Parity tests for the signal front end against torch.stft/torch.istft (the
exact ops used by the reference, stft.py:20-26,37-42 and torchaudio's
MelSpectrogram internals)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mqgan_tpu.core.config import SpectrogramConfig
from mqgan_tpu.signal.mel import MelFrontend, melscale_fbanks, LOG_CLIP_VAL
from mqgan_tpu.signal.stft import TPUSTFT, hann_window, istft, stft, stft_mag_phase


def _torch_stft(x, n_fft, hop, win):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        return_complex=True,
    )


@pytest.mark.parametrize("n_fft,hop,win", [(512, 128, 512), (2048, 512, 2048), (1024, 256, 800)])
def test_stft_matches_torch(rng, n_fft, hop, win):
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, win))
    theirs = _torch_stft(x, n_fft, hop, win).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-3)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        np.asarray(hann_window(800)), torch.hann_window(800).numpy(), atol=1e-6
    )


def test_istft_roundtrip_matches_torch(rng):
    n_fft, hop, win = 1024, 256, 1024
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    spec = _torch_stft(x, n_fft, hop, win)
    mag, ph = spec.abs().numpy(), spec.angle().numpy()

    ours = np.asarray(istft(jnp.asarray(mag), jnp.asarray(ph), n_fft, hop, win))
    theirs = torch.istft(
        torch.from_numpy(mag) * torch.exp(1j * torch.from_numpy(ph)),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
    ).numpy()
    # reference TorchSTFT.inverse unsqueezes to (B, 1, samples) (stft.py:47)
    assert ours.shape == (2, 1, theirs.shape[-1])
    np.testing.assert_allclose(ours[:, 0, :], theirs, rtol=1e-3, atol=1e-3)
    # and the roundtrip reproduces the interior of the signal
    np.testing.assert_allclose(ours[:, 0, 256:-256], x[:, 256:-256], atol=1e-3)


def test_tpustft_wrapper_roundtrip(rng):
    st = TPUSTFT(filter_length=1024, hop_length=256, win_length=1024)
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    mag, ph = st.transform(x)
    y = st.inverse(mag, ph)
    assert y.shape[0:2] == (1, 1)
    np.testing.assert_allclose(
        np.asarray(y)[0, 0, 256:-256], np.asarray(x)[0, 256:-256], atol=1e-3
    )


def test_melscale_fbanks_htk_properties():
    fb = melscale_fbanks(n_freqs=1025, f_min=0.0, f_max=22050.0, n_mels=128, sample_rate=44100)
    assert fb.shape == (1025, 128)
    assert fb.min() >= 0.0
    # every filter has support
    assert (fb.sum(axis=0) > 0).all()
    # triangular peak of each filter is <= 1 (norm=None)
    assert fb.max() <= 1.0 + 1e-6
    # filters are ordered in frequency: argmax increases monotonically
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_melscale_fbanks_matches_torchaudio_formula():
    """Cross-check against an independent torch implementation of the
    published torchaudio algorithm (HTK scale, norm=None)."""
    n_freqs, f_min, f_max, n_mels, sr = 513, 0.0, 8000.0, 80, 16000
    all_freqs = torch.linspace(0, sr // 2, n_freqs)
    m_min = 2595.0 * torch.log10(torch.tensor(1.0 + f_min / 700.0))
    m_max = 2595.0 * torch.log10(torch.tensor(1.0 + f_max / 700.0))
    m_pts = torch.linspace(m_min.item(), m_max.item(), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb_t = torch.max(torch.zeros(1), torch.min(down, up)).numpy()

    fb = melscale_fbanks(n_freqs, f_min, f_max, n_mels, sr)
    np.testing.assert_allclose(fb, fb_t, atol=1e-5)


def test_log_mel_matches_torch_pipeline(rng):
    """End-to-end: our MelFrontend vs torch.stft + matmul + log-clamp, i.e.
    the exact computation of torchaudio MelSpectrogram(power=1) as used at
    reference convert_spectrograms.py:31-35."""
    cfg = SpectrogramConfig(
        sampling_rate=16000, filter_length=512, hop_length=128, win_length=512,
        n_mel_channels=80, mel_fmin=0.0, mel_fmax=8000.0,
    )
    fe = MelFrontend(cfg)
    wav = rng.standard_normal((1, 16000)).astype(np.float32) * 0.3

    ours = np.asarray(fe(jnp.asarray(wav)))

    spec = _torch_stft(wav, 512, 128, 512).abs()  # (B, F, T)
    fb = torch.from_numpy(melscale_fbanks(257, 0.0, 8000.0, 80, 16000))
    mel = torch.matmul(spec.transpose(-1, -2), fb)  # (B, T, n_mels)
    theirs = torch.log(torch.clamp(mel, min=LOG_CLIP_VAL)).numpy()

    assert ours.shape == theirs.shape == (1, 126, 80)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    # 1-D input convenience (frames, n_mels)
    single = np.asarray(fe(jnp.asarray(wav[0])))
    np.testing.assert_allclose(single, ours[0], atol=1e-6)
